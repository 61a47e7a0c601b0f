package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.sources.Tables
import graft.operators.{Dedup, TextAnalysis}

/** Scratch profiler for the dedup family — times each sub-stage so we
  * optimize the actual bottleneck, not a guess. Not part of the library. */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.local()
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s  -> $r")
      r
    }
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("tok"))
      .select(col("doc_id"), TextAnalysis.shingles(col("tok"), 3).as("sh"))
    docs.cache().count()

    t("sig:explode+groupBy") {
      docs.select(col("doc_id").as("mh_id"), explode(col("sh")).as("tok"))
        .select(col("mh_id"), xxhash64(col("tok")).as("h"))
        .groupBy("mh_id").agg(min("h")).count()
    }
    t("minhash:candidates") { Dedup.minHashPairs(docs, "doc_id", "sh").count() }
    t("minhash:full") { Dedup.minHashDedup(docs, "doc_id", "sh", 0.8).count() }

    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), array_distinct(split(col("text"), " ")).as("tok"))
    toks.cache().count()
    t("jaccard:pairs-full") { Dedup.jaccardPairs(toks, "doc_id", "tok", "lang", 0.95) .count() }
    t("jaccard:join-only") {
      val a = toks.select(col("lang"), col("doc_id").as("l"), size(col("tok")).as("nl"))
      val b = toks.select(col("lang"), col("doc_id").as("r"), size(col("tok")).as("nr"))
      a.join(b, Seq("lang")).where(col("l") < col("r"))
        .where(col("nl") >= lit(0.95) * col("nr") - 1e-9 && col("nr") >= lit(0.95) * col("nl") - 1e-9)
        .count()
    }
    t("simhash:pairs") { Dedup.simHashPairs(toks, "doc_id", "tok", 3).count() }
    val sigOnly = toks.select(col("doc_id"), Dedup.simHash64(col("tok")).as("s"))
    t("simhash:sig-only") { sigOnly.agg(sum("s")).count() }
    spark.stop()
  }
}
/** Times named queries under the exact Bench protocol (sf0.001 warm-up,
  * blocking release between runs, median of 3) without running the other
  * 46 — the iteration loop for per-query optimization. Args: sfDir q1 q2… */
object ProfileBenchQ {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.tail.toSeq else Seq("q25_minhash_dedup", "q26_simhash_pairs")
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    def release(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }
    names.foreach { n =>
      val fn = graft.queries.Queries.all(n)
      try fn(spark, "/root/testdata/sf0.001").count() catch { case _: Throwable => }
      release()
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val c = fn(spark, dir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        release()
        (dt, c)
      }
      val med = ts.map(_._1).sorted.apply(1)
      println(f"[benchq] $n%-28s median $med%.2f s  (runs ${ts.map(t => f"${t._1}%.2f").mkString(", ")}; rows ${ts.head._2})")
    }
    spark.stop()
  }
}

object ProfileSimhash {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.GraftSession.local()
    import org.apache.spark.sql.functions._
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s  -> $r")
      r
    }
    val toks = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("tok"))
    toks.cache().count()
    t("sig:agg64-path") { Dedup.simHashSignatures(toks, "doc_id", "tok").agg(sum("sh")).collect() }
    t("sig:agg64-path-2nd") { Dedup.simHashSignatures(toks, "doc_id", "tok").agg(sum("sh")).collect() }
    t("sig:fold-column") { toks.select(Dedup.simHash64(col("tok")).as("sh")).agg(sum("sh")).collect() }
    val sigs = Dedup.simHashSignatures(toks, "doc_id", "tok").persist()
    t("sig:materialize") { sigs.count() }
    t("cand:join+distinct") {
      val chunked = sigs.select(col("sh_id"), col("sh"), posexplode(
        array((0 until 4).map(c => shiftrightunsigned(col("sh"), c * 16).bitwiseAND(0xFFFFL)): _*)
      ).as(Seq("chunk", "ckey")))
      val l = chunked.select(col("chunk"), col("ckey"), col("sh_id").as("left_id"), col("sh").as("lsh"))
      val r = chunked.select(col("chunk"), col("ckey"), col("sh_id").as("right_id"), col("sh").as("rsh"))
      val raw = l.join(r, Seq("chunk", "ckey")).where(col("left_id") < col("right_id"))
      raw.count()
    }
    spark.stop()
  }
}
/** Measures the IVF Lloyd-iteration knob: centroid build cost and
  * recall@k of ivfTopK vs the brute-force truth, per iters value.
  * Feeds the knob-curve table in SCALE.md. Args: sfDir [k] [nprobe] */
object ProfileIvf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = if (args.length > 1) args(1).toInt else 5
    val nprobe = if (args.length > 2) args(2).toInt else 2
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    import graft.operators.Similarity
    val emb = graft.sources.Tables.embeddings(spark, dir).cache()
    emb.count()
    val queries = emb.where(col("vec_id") < 30).cache()
    queries.count()
    val truth = Similarity.bruteForceTopK(queries, emb, k)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (1 to 3).foreach { iters =>
      val t0 = System.nanoTime()
      val cents = Similarity.ivfCentroids(emb, k = 16, iters = iters)
      val buildS = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val got = Similarity.ivfTopK(queries, emb, k, cents, nprobe)
        .select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val queryS = (System.nanoTime() - t1) / 1e9
      val recall = truth.intersect(got).size.toDouble / truth.size
      println(f"[ivf] iters=$iters build=$buildS%.2fs query=$queryS%.2fs recall@$k(nprobe=$nprobe)=$recall%.3f")
    }
    spark.stop()
  }
}

/** Head-to-head: string-shingle hashedSets build vs the window-lead
  * hashed-shingle build, materialization cost only. Args: sfDir */
object ProfileShingleBuild {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s  -> $r")
      r
    }
    def release(): Unit = {
      graft.GraftSession.releaseCaches(spark, blocking = true); System.gc()
    }
    val toks = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), split(col("text"), " ").as("tok"))
    (1 to 3).foreach { i =>
      t(s"string-shingles+hash#$i") {
        toks.select(col("doc_id"), col("lang"),
            graft.operators.TextAnalysis.shingles(col("tok"), 3).as("sh"))
          .select(col("doc_id"), col("lang"),
            array_distinct(transform(col("sh"), x => xxhash64(x))).as("hs"))
          .agg(sum(size(col("hs")))).head()
      }
      release()
      t(s"window-lead-hash#$i") {
        val r = Dedup.shingleHashedSetsBlocked(toks, "doc_id", "tok", 3, Seq("lang"))
          .agg(sum(size(col("hs")))).head()
        release(); r
      }
    }
    spark.stop()
  }
}

/** Attributes q41's cost across its stages (pair generation, edge
  * symmetrize+count, component labeling, canonical join) under the Bench
  * protocol's release discipline — written to explain the round-8 +74%
  * drift before touching any code. Args: sfDir */
object ProfileQ41 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    import org.apache.spark.storage.StorageLevel
    def release(): Unit = {
      graft.GraftSession.releaseCaches(spark, blocking = true)
      System.gc()
    }
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s  -> $r")
      r
    }
    // stage timings (shared work persisted so each stage is its own cost)
    val docs = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        array_distinct(split(col("text"), " ")).as("tok"))
    val pairs = t("pairs:jaccard") {
      val p = Dedup.jaccardPairs(docs, "doc_id", "tok", "lang", 0.95)
        .persist(StorageLevel.MEMORY_AND_DISK)
      p.count(); p
    }
    val edges = t("edges:sym+distinct+count") {
      val e = pairs.select(col("left_id").as("src"), col("right_id").as("dst"))
        .unionByName(pairs.select(col("right_id").as("src"), col("left_id").as("dst")))
        .distinct().persist(StorageLevel.MEMORY_AND_DISK)
      e.count(); e
    }
    t("cc:full") { Dedup.connectedComponents(pairs).count() }
    t("canon:join") { Dedup.canonicalIds(docs.select("doc_id"), "doc_id", pairs).count() }
    edges.unpersist(blocking = true); pairs.unpersist(blocking = true)
    release()
    // the full query, repeated, to expose run-to-run variance
    (1 to 4).foreach { i =>
      t(s"q41:full#$i") { graft.queries.Queries.all("q41_dedup_clusters")(spark, dir).count() }
      release()
    }
    spark.stop()
  }
}

object ProfileJaccard {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.GraftSession.local()
    import org.apache.spark.sql.functions._
    import org.apache.spark.storage.StorageLevel
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s  -> $r")
      r
    }
    val threshold = 0.95
    val docs = graft.sources.Tables.documents(spark, dir)
    val hs = docs.select(col("lang").as("blk"), col("doc_id").as("hs_id"),
        array_distinct(transform(array_distinct(split(col("text"), " ")), x => xxhash64(x))).as("hs"))
      .withColumn("n", size(col("hs"))).persist(StorageLevel.MEMORY_AND_DISK)
    t("hs:materialize") { hs.count() }
    val tokDf = hs.select(explode(col("hs")).as("h")).groupBy("h").agg(count(lit(1)).as("tdf"))
    t("tokDf") { tokDf.count() }
    val ordered = hs.select(col("blk"), col("hs_id"), col("n"), explode(col("hs")).as("h"))
      .join(tokDf, "h").groupBy("blk", "hs_id", "n")
      .agg(transform(array_sort(collect_list(struct(col("tdf"), col("h")))), s => s.getField("h")).as("ord"))
      .withColumn("prefix", slice(col("ord"), lit(1), (col("n") - ceil(lit(threshold) * col("n")) + 1).cast("int")))
    val pre = ordered.select(col("blk"), col("hs_id"), col("n"), col("ord"), explode(col("prefix")).as("h"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    t("pre:materialize") { pre.count() }
    val l = pre.select(col("blk"), col("h"), col("hs_id").as("left_id"), col("n").as("nl"), col("ord").as("ls"))
    val r = pre.select(col("blk"), col("h"), col("hs_id").as("right_id"), col("n").as("nr"), col("ord").as("rs"))
    val raw = l.join(r, Seq("blk", "h")).where(col("left_id") < col("right_id"))
      .where(col("nl") >= lit(threshold) * col("nr") - 1e-9 && col("nr") >= lit(threshold) * col("nl") - 1e-9)
    t("cand:raw") { raw.count() }
    val dd = raw.dropDuplicates("left_id", "right_id")
    t("cand:dropDup") { dd.count() }
    t("verify") { dd.withColumn("inter", size(array_intersect(col("ls"), col("rs"))))
      .withColumn("jaccard", col("inter").cast("double") / (col("nl") + col("nr") - col("inter")))
      .where(col("jaccard") >= threshold).count() }
    spark.stop()
  }
}

object ProfilePq {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    val e = graft.sources.Tables.embeddings(spark, dir)
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[pq] $name%-20s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val warm = t("train-warm")(graft.operators.Similarity.pqTrain(e, 4, 16, 1))
    val books = t("train")(graft.operators.Similarity.pqTrain(e, 4, 16, 1))
    val codes = graft.operators.Similarity.pqEncode(e, books)
    t("encode-count")(codes.count())
    t("encode-count2")(codes.count())
    val q = e.where(col("vec_id") < 10)
    t("topk")(graft.operators.Similarity.pqTopK(q, codes, books, 5).count())
    t("topk2")(graft.operators.Similarity.pqTopK(q, codes, books, 5).count())
    spark.stop()
  }
}
