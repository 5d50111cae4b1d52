package graft.api

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.TestSpark

/** The one-call curation API must agree with the oracle-checked query
  * surface it composes — ledger columns are pinned against the t5 and c2
  * query outputs, and the packed layout re-derives gapless per shard.
  */
class CurationApiSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private lazy val result = Curation.run(spark, sf)

  test("ledger covers every document and kept implies every stage verdict") {
    val n = graft.Tables.documents(spark, sf).count()
    val rows = result.ledger.collect()
    assert(rows.length.toLong === n)
    rows.filter(_.getAs[Boolean]("kept")).foreach { r =>
      assert(r.getAs[Boolean]("q_pass") && r.getAs[Boolean]("is_keeper") &&
        r.getAs[Boolean]("clean") && r.getAs[Boolean]("canonical") &&
        r.getAs[Boolean]("sampled") && r.getAs[Boolean]("temp_kept") &&
        r.getAs[Boolean]("mix_kept") && !r.getAs[Boolean]("is_eval"))
    }
    // no domainTargets configured -> the mixing stage is an identity gate
    assert(rows.forall(_.getAs[Boolean]("mix_kept")))
    val kept = rows.filter(_.getAs[Boolean]("kept")).map(_.getAs[Long]("doc_id")).toSet
    assert(kept.nonEmpty, "a snapshot that keeps nothing is a config bug")
    val snapIds = result.snapshot.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(snapIds === kept)
  }

  test("ledger verdicts equal the oracle-checked query outputs (t5, c2)") {
    val ledger = result.ledger.collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Boolean]("q_pass"), r.getAs[Boolean]("canonical"))).toMap
    val t5 = graft.operators.TextOps.queries("t5_quality_filter")(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("kept")).toMap
    val c2 = graft.operators.CurationOps.queries("c2_canonical_keep")(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("canonical")).toMap
    assert(ledger.nonEmpty)
    ledger.foreach { case (id, (qPass, canon)) =>
      assert(qPass === t5(id), s"q_pass drift for doc $id")
      assert(canon === c2(id), s"canonical drift for doc $id")
    }
  }

  test("domain-mixture knob drops unlisted sources and gates listed ones at t15 rates") {
    val targets = Map("src1" -> 3.0, "src2" -> 1.0)
    val mixed = Curation.run(spark, sf, Curation.Config(domainTargets = targets))
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "source").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("source")).toMap
    val ledger = mixed.ledger.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("mix_kept")).toMap
    // every unlisted source gets rate 0 -> mix_kept false everywhere
    ledger.foreach { case (id, kept) =>
      if (!targets.contains(docs(id))) assert(!kept, s"unlisted-source doc $id kept")
    }
    // the listed sources' gates replicate the broadcast rate table exactly
    val rates = graft.operators.TextOps
      .domainMixRates(graft.Tables.documents(spark, sf), targets)
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Long]("rate_ppm")).toMap
    // src1 asks for 3x src2's share of equal-sized sources: src1 is binding
    // (keeps all, rate = 1e6) and src2 subsamples to a third
    assert(rates("src1") === 1000000L)
    assert(rates("src2") === 333333L)
    val keptBySource = ledger.toSeq.filter(_._2).groupBy(kv => docs(kv._1)).map {
      case (s, kvs) => s -> kvs.size
    }
    assert(keptBySource.keySet === Set("src1", "src2"))
    // realized mixture tracks the 3:1 target on the ppm-gated hash sample
    assert(keptBySource("src1") > keptBySource("src2"))
  }

  test("packs lay the kept snapshot out gapless per shard") {
    val packs = result.packs.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("shard"),
        r.getAs[Int]("n_tokens"), r.getAs[Int]("pack_id"), r.getAs[Int]("pack_offset")))
    assert(packs.nonEmpty)
    assert(packs.map(_._1).toSet ===
      result.snapshot.select("doc_id").collect().map(_.getLong(0)).toSet)
    packs.groupBy(_._2).foreach { case (shard, docs) =>
      var cum = 0L
      docs.sortBy(_._1).foreach { case (id, _, n, packId, off) =>
        assert(packId === (cum / 256).toInt, s"doc $id in shard $shard")
        assert(off === (cum % 256).toInt, s"doc $id in shard $shard")
        cum += n
      }
    }
  }

  test("span-coverage knob excludes exactly the docs d11 reports above threshold") {
    // default config: stage disabled, span_ok vacuously true everywhere
    assert(result.ledger.collect().forall(_.getAs[Boolean]("span_ok")))
    val gated = Curation.run(spark, sf, Curation.Config(maxDupSpanFrac = 0.2))
    val spanOk = gated.ledger.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("span_ok")).toMap
    val d11 = graft.operators.Dedup.queries("d11_dup_spans")(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("dup_frac")).toMap
    assert(spanOk.nonEmpty)
    spanOk.foreach { case (id, ok) =>
      assert(ok === (d11.getOrElse(id, 0.0) <= 0.2), s"span_ok drift for doc $id")
    }
    assert(spanOk.exists(!_._2), "threshold 0.2 excludes nothing at this SF — weak fixture")
  }

  test("maxPerSource knob equals the oracle-checked t17 selection") {
    // default config: stage disabled, cap_kept vacuously true everywhere
    assert(result.ledger.collect().forall(_.getAs[Boolean]("cap_kept")))
    val cap = 2
    val capped = Curation.run(spark, sf, Curation.Config(maxPerSource = cap))
    val capKept = capped.ledger.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("cap_kept")).toMap
    val docs = graft.Tables.documents(spark, sf)
      .select("source", "doc_id", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expectedKeep = docs.groupBy(_._1).values.flatMap(
      _.sortBy(r => (-r._3, r._2)).take(cap).map(_._2)).toSet
    assert(capKept.keySet === docs.map(_._2).toSet)
    capKept.foreach { case (id, ok) =>
      assert(ok === expectedKeep.contains(id), s"cap_kept drift for doc $id")
    }
    assert(capKept.exists(!_._2), "cap 2 excludes nothing at this SF — weak fixture")
  }

  test("admitBatch knob equals the oracle-checked d12 verdicts") {
    // default config: stage disabled — nothing is "new", everything admitted
    result.ledger.collect().foreach { r =>
      assert(!r.getAs[Boolean]("is_new") && r.getAs[Boolean]("admitted"))
    }
    val admitted = Curation.run(spark, sf, Curation.Config(admitBatch = Some((5L, 4L))))
    val ledger = admitted.ledger.collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Boolean]("is_new"), r.getAs[Boolean]("admitted"))).toMap
    val d12 = graft.operators.Dedup.queries("d12_incremental")(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_new") -> r.getAs[Int]("is_dup")).toMap
    assert(ledger.nonEmpty)
    ledger.foreach { case (id, (isNew, adm)) =>
      assert(isNew === (id % 5 == 4), s"is_new drift for doc $id")
      if (isNew) assert(adm === (d12(id) == 0), s"admitted drift for doc $id")
      else assert(adm, s"standing-corpus doc $id must be vacuously admitted")
    }
    assert(ledger.exists { case (_, (isNew, adm)) => isNew && !adm },
      "batch (5,4) rejects nothing at this SF — weak fixture")
  }

  test("split tags equal the oracle-checked c3 assignment and never straddle components") {
    val ledger = result.ledger.collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("component"), r.getAs[String]("split"))).toMap
    val c3 = graft.operators.CurationOps.queries("c3_leakage_safe_split")(spark, sf)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    assert(ledger.nonEmpty && ledger.keySet === c3.keySet)
    ledger.foreach { case (id, (_, split)) =>
      assert(split === c3(id), s"split drift for doc $id")
    }
    // leakage safety: a component is entirely inside one split
    ledger.values.groupBy(_._1).foreach { case (comp, members) =>
      assert(members.map(_._2).toSet.size === 1, s"component $comp straddles splits")
    }
    // custom pcts move the boundaries through the same shared hash
    val wide = Curation.run(spark, sf, Curation.Config(splitPcts = (50, 25)))
    val tags = wide.ledger.select("split").collect().map(_.getString(0)).toSet
    assert(tags.contains("test") && tags.contains("train"))
  }

  test("imageDedup knob drops exactly m6's doc_b side (keep-first over the pair artifact)") {
    // default config: stage disabled, img_kept vacuously true everywhere
    assert(result.ledger.collect().forall(_.getAs[Boolean]("img_kept")))
    val gated = Curation.run(spark, sf, Curation.Config(imageDedup = true))
    val imgKept = gated.ledger.collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Boolean]("img_kept"), r.getAs[Boolean]("kept"))).toMap
    val m6Drop = graft.operators.Multimodal.queries("m6_phash_pairs")(spark, sf)
      .select("doc_b").collect().map(_.getLong(0)).toSet
    assert(m6Drop.nonEmpty, "m6 finds no perceptual pairs at this SF — weak fixture")
    imgKept.foreach { case (id, (ok, kept)) =>
      assert(ok === !m6Drop.contains(id), s"img_kept drift for doc $id")
      if (kept) assert(ok, s"doc $id kept despite a surviving earlier image near-twin")
    }
  }

  test("redact knob scrubs snapshot text through the t16 patterns") {
    val redacted = Curation.run(spark, sf, Curation.Config(redact = true))
    val plain = result.snapshot.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val scrubbed = redacted.snapshot.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(scrubbed.keySet === plain.keySet)
    // the synthetic corpus carries no PII: redaction must be a no-op here
    // (the pattern battery itself is pinned by TextQualitySpec's t16 cases)
    scrubbed.foreach { case (id, t) => assert(t === plain(id), s"doc $id") }
  }

  test("writeSnapshot round-trips: written parquet == returned frames") {
    import org.apache.spark.sql.functions.col
    val out = java.nio.file.Files.createTempDirectory("curation_snap").toString
    val files = Curation.write(result, out)
    assert(files.keySet === Set("ledger", "snapshot", "packs"))
    assert(files.values.forall(_ > 0), s"empty table in $files")

    def assertSameSet(a: org.apache.spark.sql.DataFrame,
        b: org.apache.spark.sql.DataFrame, what: String): Unit = {
      val bb = b.select(a.columns.map(col).toIndexedSeq: _*)
      assert(a.exceptAll(bb).isEmpty && bb.exceptAll(a).isEmpty, s"$what differs")
    }
    assertSameSet(spark.read.parquet(s"$out/ledger"), result.ledger, "ledger")
    // the written snapshot/packs carry the pack shard as a partition column
    val shardOf = result.packs.select(col("doc_id"), col("shard"))
    assertSameSet(spark.read.parquet(s"$out/snapshot")
      .withColumn("shard", col("shard").cast("int")),
      result.snapshot.join(shardOf, "doc_id"), "snapshot")
    assertSameSet(spark.read.parquet(s"$out/packs")
      .withColumn("shard", col("shard").cast("int")),
      result.packs, "packs")

    // determinism: a second write of the same result is byte-stable
    val out2 = java.nio.file.Files.createTempDirectory("curation_snap2").toString
    Curation.write(result, out2)
    // part-file NAMES embed a per-write UUID; content is the stable part —
    // key by containing directory, value = the sorted content digests
    def digest(root: String): Map[String, Seq[String]] = {
      val base = java.nio.file.Paths.get(root)
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
        else if (f.getName.startsWith("part-")) Seq(f) else Seq.empty
      walk(new java.io.File(root))
        .map { f =>
          val md = java.security.MessageDigest.getInstance("MD5")
          base.relativize(f.toPath.getParent).toString ->
            md.digest(java.nio.file.Files.readAllBytes(f.toPath))
              .map("%02x".format(_)).mkString
        }
        .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    }
    assert(digest(out) === digest(out2), "snapshot write is not byte-stable")
  }

  test("packIds + admitBatch: appended BPE layout and materialized tensors " +
      "match a driver-side re-pack, and the write digest covers the ids") {
    import org.apache.spark.sql.functions.col
    val cfg = Curation.Config(packIds = true, admitBatch = Some((5L, 4L)))
    val res = Curation.run(spark, sf, cfg)
    val P = cfg.packSize

    val seqs = graft.operators.TextOps.docIdSeqs(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val packs = res.packs.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("shard"),
        r.getAs[Int]("n_tokens"), r.getAs[Int]("pack_id"), r.getAs[Int]("pack_offset")))
    assert(packs.nonEmpty)
    // layout counts are the BPE sequence lengths, not whitespace counts
    packs.foreach { case (id, _, n, _, _) =>
      assert(n === seqs(id).size, s"doc $id: layout count is not the BPE length")
    }
    // append semantics: the layout equals a full re-pack of each shard's
    // stream in (is_new, doc_id) order — standing docs first, batch appended
    packs.groupBy(_._2).foreach { case (shard, rows) =>
      var cum = 0L
      rows.sortBy(r => (r._1 % 5 == 4, r._1)).foreach { case (id, _, n, packId, off) =>
        assert(packId === (cum / P).toInt, s"doc $id in shard $shard: pack_id")
        assert(off === (cum % P).toInt, s"doc $id in shard $shard: pack_offset")
        cum += n
      }
    }
    // tensors == the same shard streams cut into P-sized chunks
    val tensors = res.tensors.get.collect()
      .map(r => (r.getAs[Int]("shard"), r.getAs[Int]("pack_id")) ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"), r.getSeq[Long](4)))
      .toMap
    val reference = packs.groupBy(_._2).flatMap { case (shard, rows) =>
      val docs = rows.map(_._1).sortBy(id => (id % 5 == 4, id))
      val stream = docs.flatMap(seqs(_))
      stream.grouped(P).zipWithIndex.map { case (chunk, pi) =>
        (shard, pi) -> chunk.toSeq
      }
    }
    assert(tensors.keySet === reference.keySet, "tensor pack key sets differ")
    reference.foreach { case (k, chunk) =>
      val (nDocs, nTokens, ids) = tensors(k)
      assert(ids === chunk, s"$k: tensor ids differ")
      assert(nTokens === chunk.size.toLong, s"$k: n_tokens")
      assert(nDocs >= 1L, s"$k: n_docs")
    }

    // write round-trip: the tensors table lands in the shard dirs, the ids
    // column survives parquet, and a second write is byte-stable (the
    // digest pin now covers the materialized ids)
    val out = java.nio.file.Files.createTempDirectory("curation_tensors").toString
    val files = Curation.write(res, out, cfg.packShards)
    assert(files.keySet === Set("ledger", "snapshot", "packs", "tensors"))
    assert(files("tensors") > 0)
    val back = spark.read.parquet(s"$out/tensors")
      .select(col("shard").cast("int").as("shard"), col("pack_id"),
        col("n_docs"), col("n_tokens"), col("ids"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getSeq[Long](4)))
      .toMap
    assert(back === tensors, "written tensors differ from returned frame")
    val out2 = java.nio.file.Files.createTempDirectory("curation_tensors2").toString
    Curation.write(res, out2, cfg.packShards)
    def digest(root: String): Map[String, Seq[String]] = {
      val base = java.nio.file.Paths.get(root)
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
        else if (f.getName.startsWith("part-")) Seq(f) else Seq.empty
      walk(new java.io.File(root))
        .map { f =>
          val md = java.security.MessageDigest.getInstance("MD5")
          base.relativize(f.toPath.getParent).toString ->
            md.digest(java.nio.file.Files.readAllBytes(f.toPath))
              .map("%02x".format(_)).mkString
        }
        .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    }
    assert(digest(out) === digest(out2), "tensor write is not byte-stable")
  }

  test("packIds + redact: tensors tokenize the REDACTED snapshot, and a " +
      "whitespace-only kept doc stays in the layout at n_tokens=0") {
    // The shipped corpora carry no PII (redaction is a no-op there — pinned
    // above), so the leak-path pin needs its own corpus: every third doc
    // gets a synthetic email appended (t16's pattern), plus one whitespace-
    // only doc that tokenizes to nothing (the dropped-row path).
    val docs0 = graft.Tables.documents(spark, sf)
    val maxId = docs0.agg(max("doc_id")).first().getLong(0)
    val laced = docs0.withColumn("text",
      when(col("doc_id") % 3 === 0,
        concat(col("text"), lit(" contact user"), col("doc_id").cast("string"),
          lit("@mail.example.org"))).otherwise(col("text")))
    val wsRow = docs0.limit(1)
      .withColumn("doc_id", lit(maxId + 1))
      .withColumn("lang", lit("wsonly")) // unique lang -> temp rate 1e6, kept
      .withColumn("text", lit("   "))
    val dir = java.nio.file.Files.createTempDirectory("curation_pii").toString
    laced.unionByName(wsRow).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val cfg = Curation.Config(redact = true, packIds = true,
      samplePct = 100, qualityThreshold = 0.0, evalModulus = 1000003L)
    val res = Curation.run(spark, dir, cfg)
    val kept = res.ledger.where(col("kept")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept.exists(id => id % 3 == 0 && id <= maxId),
      "no PII-laced doc survived the gates — fixture too aggressive")
    assert(kept.contains(maxId + 1), "whitespace-only doc must survive the gates")

    // what the tensors MUST contain: the trained tokenizer applied to the
    // post-redaction text (spec-side redaction, independent of Curation's)
    val redactedKept = graft.Tables.documents(spark, dir)
      .where(col("doc_id").isin(kept.toSeq: _*))
      .select(col("doc_id"), graft.operators.TextOps.redactPii(col("text")).as("text"))
    val expSeqs = graft.operators.TextOps.idSeqsOf(spark, dir, redactedKept)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // ...and what they must NOT contain: the raw-corpus encode of PII docs
    val rawSeqs = graft.operators.TextOps.docIdSeqs(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val piiKept = kept.filter(id => id % 3 == 0 && id <= maxId)
    piiKept.foreach { id =>
      assert(expSeqs(id) !== rawSeqs(id),
        s"doc $id: redaction left the token stream unchanged — vacuous pin")
    }

    val packs = res.packs.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("shard"),
        r.getAs[Int]("n_tokens"), r.getAs[Int]("pack_id"), r.getAs[Int]("pack_offset")))
    // one layout row per kept doc, INCLUDING the token-less one (r12 ADVICE)
    assert(packs.map(_._1).toSet === kept)
    val wsRowOut = packs.find(_._1 == maxId + 1).get
    assert(wsRowOut._3 === 0, "whitespace-only doc must lay out at n_tokens=0")
    // layout counts are the REDACTED sequence lengths
    packs.foreach { case (id, _, n, _, _) =>
      assert(n === expSeqs.getOrElse(id, Seq.empty).size,
        s"doc $id: layout count is not the redacted-text BPE length")
    }
    // tensors == the redacted shard streams cut into P-sized chunks: the
    // materialized ids are exactly the post-redaction encode, nothing else
    val P = cfg.packSize
    val tensors = res.tensors.get.collect()
      .map(r => (r.getAs[Int]("shard"), r.getAs[Int]("pack_id")) -> r.getSeq[Long](4))
      .toMap
    val reference = packs.groupBy(_._2).flatMap { case (shard, rows) =>
      val stream = rows.map(_._1).sorted.flatMap(id => expSeqs.getOrElse(id, Seq.empty))
      stream.grouped(P).zipWithIndex.map { case (chunk, pi) => (shard, pi) -> chunk.toSeq }
    }
    assert(tensors.keySet === reference.keySet, "tensor pack key sets differ")
    reference.foreach { case (k, chunk) =>
      assert(tensors(k) === chunk, s"$k: tensor ids differ from the redacted encode")
    }
  }
}
