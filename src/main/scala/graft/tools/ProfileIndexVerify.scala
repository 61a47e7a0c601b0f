package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only: receiver-side index verification AT SCALE. The
  * [[graft.operators.Similarity.ivfPqIndexVerify]] spec proves the
  * discrepancy taxonomy (MISSING/EXTRA/CORRUPT/MALFORMED) at test size;
  * this run evidences the SCALE claim — "|index| bytes streamed once,
  * distributed; driver work is metadata-scale" — by building an index
  * with thousands of data files (the nightly-ingest shape: one base
  * write plus many appended batches across a wide cluster fan-out),
  * stamping it, and timing a clean verify plus a one-bit-flip re-verify.
  *
  * Usage: `runMain graft.tools.ProfileIndexVerify [copies] [appends] [k]`
  * (defaults 50 / 60 / 32 — ~2k files from sf0.1's 2 000-vector table). */
object ProfileIndexVerify {
  def main(args: Array[String]): Unit = {
    val copies = args.lift(0).map(_.toInt).getOrElse(50)
    val appends = args.lift(1).map(_.toInt).getOrElse(60)
    val k = args.lift(2).map(_.toInt).getOrElse(32)
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.hadoop.fs.Path

    val base = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.1")
      .select(col("vec_id"), col("embedding")).persist()
    val n = base.count()
    val coarse = graft.operators.Similarity.ivfCentroids(base, k = k, iters = 1)
    val books = graft.operators.Similarity.pqTrain(base, m = 4, ksub = 16, iters = 1)

    val path = s"${System.getProperty("java.io.tmpdir")}/graft_verify_scale_" +
      spark.sparkContext.applicationId.replaceAll("[^A-Za-z0-9]", "_")
    graft.operators.Similarity.ivfPqIndexWrite(base, path, coarse, books)
    (1 to appends).foreach { i =>
      // each batch re-keys a slice of the copy space so ids stay unique
      val b = base.select((col("vec_id") + lit(i.toLong * n * copies)).as("vec_id"),
        col("embedding"))
      graft.operators.Similarity.ivfPqIndexAppend(b, path, coarse, books)
    }
    graft.operators.Similarity.ivfPqIndexManifest(spark, path)

    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(new Path(path))
      .filter(d => d.isDirectory && d.getPath.getName.startsWith("cluster="))
      .flatMap(d => fs.listStatus(d.getPath))
      .filter(f => f.getPath.getName.endsWith(".parquet"))
    val bytes = files.map(_.getLen).sum
    println(f"[idxverify] index built: ${files.length} data files, " +
      f"${bytes >> 20} MB, k=$k appends=$appends")

    def timedVerify(tag: String): Unit = {
      val c = ProfileUtil.calib(spark)
      val t0 = System.nanoTime()
      val problems = graft.operators.Similarity.ivfPqIndexVerify(spark, path)
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[idxverify] $tag calib=$c%.3f wall=$dt%.2f s " +
        f"problems=${problems.length}")
      problems.take(3).foreach(p => println(s"[idxverify]   $p"))
    }
    timedVerify("clean-rep1")
    timedVerify("clean-rep2")

    // flip one byte mid-file in an arbitrary data file: the re-verify must
    // name exactly that file as CORRUPT (md5 alone — length preserved)
    val victim = files(files.length / 2).getPath
    val len = fs.getFileStatus(victim).getLen
    // this harness is explicitly a scale tool: a >= 2 GB victim would make
    // len.toInt wrap negative (or silently truncate the rewrite) — fail
    // loudly instead of corrupting the fixture it is about to measure
    require(len <= Int.MaxValue,
      s"bit-flip buffer path only handles files < 2 GB, $victim is $len B")
    val buf = new Array[Byte](len.toInt)
    val in = fs.open(victim); try in.readFully(0L, buf) finally in.close()
    buf(buf.length / 2) = (buf(buf.length / 2) ^ 0x1).toByte
    val out = fs.create(victim, true); try out.write(buf) finally out.close()
    println(s"[idxverify] flipped one bit in $victim")
    timedVerify("one-bit-flip")

    fs.delete(new Path(path), true)
    spark.stop()
  }
}
