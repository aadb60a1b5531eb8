package graft

import graft.ops.Packing

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def docs = (0L until 200L).map { i =>
    // token counts 1..20, deterministic
    (i, (0 until (i % 20 + 1).toInt).map(j => s"w$j").mkString(" "), "en")
  }.toDF("doc_id", "text", "lang")

  test("every doc assigned exactly once; no shard over budget") {
    val got = Packing.packByTokenBudget(docs, budget = 50, parts = 4)
      .as[(Long, Long, Long)].collect()
    assert(got.map(_._1).sorted.toSeq == (0L until 200L)) // exhaustive, once
    val perShard = got.groupBy(_._3).map { case (_, rows) => rows.map(_._2).sum }
    assert(perShard.forall(_ <= 50L), s"over-budget shard: $perShard")
  }

  test("oversized single doc gets its own shard, others stay bounded") {
    val wide = Seq((1L, (0 until 100).map(j => s"w$j").mkString(" "), "en"),
      (2L, "a b", "en"), (3L, "c d", "en")).toDF("doc_id", "text", "lang")
    val got = Packing.packByTokenBudget(wide, budget = 10, parts = 1)
      .as[(Long, Long, Long)].collect()
    val byShard = got.groupBy(_._3).view.mapValues(_.map(_._1).toSet).toMap
    assert(byShard.values.exists(_ == Set(1L))) // the oversize doc is alone
  }

  test("deterministic across runs and input partition layout") {
    val a = Packing.packByTokenBudget(docs, 50, parts = 4)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val b = Packing.packByTokenBudget(docs.repartition(7), 50, parts = 4)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(a == b) // repartition(parts, key) re-establishes the layout
  }

  test("shards are reasonably full (waste bounded)") {
    val got = Packing.packByTokenBudget(docs, budget = 50, parts = 4)
      .as[(Long, Long, Long)].collect()
    val fills = got.groupBy(_._3).map { case (_, r) => r.map(_._2).sum }.toSeq
    // all but the tail shard of each partition should be >60% full
    val underfull = fills.count(_ < 30L)
    assert(underfull <= 4, s"fills=$fills") // ≤ one tail shard per partition
  }

  test("chunkTokens covers every token exactly, with the stated overlap") {
    // 10 tokens, size 8, stride 4 → starts 0 and 4 only (a start at 8
    // would add no new tokens and must not be emitted)
    val doc = Seq((1L, (0 until 10).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val got = Packing.chunkTokens(doc, chunkSize = 8, stride = 4)
      .select("chunk_idx", "chunk_start", "n_tokens", "chunk_text")
      .as[(Int, Int, Int, String)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (0, 0, 8, (0 until 8).map(i => s"t$i").mkString(" ")),
      (1, 4, 6, (4 until 10).map(i => s"t$i").mkString(" "))))
  }

  test("chunkTokens: short doc yields one partial chunk, empty doc none") {
    val docs = Seq((1L, "a b c"), (2L, "!!! ???")).toDF("doc_id", "text")
    val got = Packing.chunkTokens(docs, chunkSize = 8, stride = 4)
      .select("doc_id", "n_tokens", "chunk_text")
      .as[(Long, Int, String)].collect().toSeq
    assert(got == Seq((1L, 3, "a b c")))
  }

  test("chunkTokens: non-overlapping when stride == chunkSize") {
    val doc = Seq((1L, (0 until 9).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val got = Packing.chunkTokens(doc, chunkSize = 4, stride = 4)
      .select("chunk_start", "n_tokens").as[(Int, Int)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((0, 4), (4, 4), (8, 1)))
    // exact coverage: token counts sum to the document length
    assert(got.map(_._2).sum == 9)
  }

  test("packedSequences: exact-length sequences, token stream preserved") {
    val fixture = Seq(
      (1L, "a b c d e"), (2L, "f g"), (3L, "h i j k l m n o p"))
      .toDF("doc_id", "text")
    val got = Packing.packedSequences(fixture, seqLen = 4, parts = 1)
      .as[(Long, Int, String)].collect().sortBy(_._1).toSeq
    // 16 tokens total → 4 full sequences of 4, no partial
    assert(got.map(_._2) == Seq(4, 4, 4, 4))
    // concatenation order is doc_id order; boundaries crossed
    assert(got.map(_._3).mkString(" ") ==
      "a b c d e f g h i j k l m n o p")
  }

  test("packedSequencesWithBounds: doc starts mark block-attention boundaries") {
    val fixture = Seq(
      (1L, "a b c d e"),       // starts seq 0 @ 0
      (2L, "f g"),             // starts seq 1 @ 1 (seq 1 opens mid-doc-1)
      (3L, "h i j k l m n o p"), // starts seq 1 @ 3
      (4L, ""),                // zero tokens: no boundary anywhere
      (5L, "q r"))             // starts seq 4 (the partial) @ 0
      .toDF("doc_id", "text")
    val got = Packing.packedSequencesWithBounds(fixture, seqLen = 4, parts = 1)
      .as[(Long, Int, String, Seq[Int], Seq[Long])].collect()
      .sortBy(_._1).toSeq
    assert(got.map(_._2) == Seq(4, 4, 4, 4, 2))
    assert(got.map(g => (g._4, g._5)) == Seq(
      (Seq(0), Seq(1L)),        // "a b c d": doc 1 starts at 0
      (Seq(1, 3), Seq(2L, 3L)), // "e f g h": doc 2 @ 1, doc 3 @ 3
      (Seq(), Seq()),           // "i j k l": continuation only
      (Seq(), Seq()),           // "m n o p"
      (Seq(0), Seq(5L))))       // "q r": doc 5 at 0; doc 4 never appears
    // packedSequences is a pure projection of this pass (one definition)
    val proj = Packing.packedSequences(fixture, seqLen = 4, parts = 1)
      .as[(Long, Int, String)].collect().sortBy(_._1).toSeq
    assert(proj == got.map(g => (g._1, g._2, g._3)))
    // the pre-existing contract holds: NON-numeric ids still pack (keyed
    // on the original column; only the bounds ids fall back to -1)
    val strIds = Seq(("docA", "a b c"), ("docB", "d e"))
      .toDF("doc_id", "text")
    val sp = Packing.packedSequencesWithBounds(strIds, seqLen = 4, parts = 1)
      .as[(Long, Int, String, Seq[Int], Seq[Long])].collect().sortBy(_._1).toSeq
    assert(sp.map(_._3) == Seq("a b c d", "e"))
    assert(sp.head._5 == Seq(-1L, -1L)) // ids unavailable, packing exact
  }

  test("packedSequences with eosToken: sentinel after every non-empty doc") {
    val fixture = Seq(
      (1L, "a b c"),  // stream: a b c <eos>
      (2L, ""),       // zero tokens: no sentinel either
      (3L, "d e"))    // stream: d e <eos>
      .toDF("doc_id", "text")
    val got = Packing.packedSequencesWithBounds(fixture, seqLen = 4,
        parts = 1, eosToken = Some("<eos>"))
      .as[(Long, Int, String, Seq[Int], Seq[Long])].collect()
      .sortBy(_._1).toSeq
    // stream = a b c <eos> d e <eos> → "a b c <eos>" + "d e <eos>"
    assert(got.map(_._3) == Seq("a b c <eos>", "d e <eos>"), got)
    assert(got.map(_._2) == Seq(4, 3)) // sentinel counts toward n_tokens
    // boundaries mark the first REAL token: doc 3 starts at offset 0 of
    // seq 1 (right after doc 1's sentinel); empty doc 2 never appears
    assert(got.map(g => (g._4, g._5)) == Seq(
      (Seq(0), Seq(1L)), (Seq(0), Seq(3L))))
    // default (no eosToken) is byte-identical to the pre-existing output
    val plain = Packing.packedSequences(fixture, seqLen = 4, parts = 1)
      .as[(Long, Int, String)].collect().sortBy(_._1).toSeq
    assert(plain.map(_._3) == Seq("a b c d", "e"))
  }

  test("fimTransform: PSM reorder reassembles to the original tokens") {
    import graft.ops.Core
    val docs = (1L to 40L).map(i =>
      (i, (1 to 12).map(j => s"d${i}w$j").mkString(" ")))
      .toDF("doc_id", "text") :: Nil
    val got = graft.ops.Packing.fimTransform(docs.head, fimRate = 0.5)
      .as[(Long, Int, String)].collect().sortBy(_._1).toSeq
    assert(got.size == 40)
    val transformed = got.filter(_._2 == 1)
    val passthrough = got.filter(_._2 == 0)
    // a 0.5 hash-rate over 40 ids transforms SOME and passes SOME through
    assert(transformed.nonEmpty && passthrough.nonEmpty, got.map(_._2).toSeq)
    passthrough.foreach { case (id, _, text) =>
      assert(text == (1 to 12).map(j => s"d${id}w$j").mkString(" "))
    }
    transformed.foreach { case (id, _, text) =>
      val toks = text.split(" ").toSeq
      // sentinels appear exactly once, in P-S-M order
      val ip = toks.indexOf("<fim_prefix>")
      val is = toks.indexOf("<fim_suffix>")
      val im = toks.indexOf("<fim_middle>")
      assert(ip == 0 && is > ip && im > is, text)
      assert(toks.count(_.startsWith("<fim_")) == 3, text)
      // prefix ++ middle ++ suffix == the original token stream
      val prefix = toks.slice(ip + 1, is)
      val suffix = toks.slice(is + 1, im)
      val middle = toks.drop(im + 1)
      assert(prefix ++ middle ++ suffix ==
        (1 to 12).map(j => s"d${id}w$j"), text)
    }
    // deterministic: identical output on a re-run
    val again = graft.ops.Packing.fimTransform(docs.head, fimRate = 0.5)
      .as[(Long, Int, String)].collect().sortBy(_._1).toSeq
    assert(again == got)
    // rate 0 never transforms; empty doc passes through at rate 1
    val zero = graft.ops.Packing.fimTransform(docs.head, fimRate = 0.0)
      .as[(Long, Int, String)].collect()
    assert(zero.forall(_._2 == 0))
    val empty = graft.ops.Packing.fimTransform(
        Seq((7L, "")).toDF("doc_id", "text"), fimRate = 1.0)
      .as[(Long, Int, String)].collect().head
    assert(empty == ((7L, 0, "")))
    // cut points vary across ids (not all degenerate): some doc has a
    // non-empty middle
    assert(transformed.exists(t => t._3.split(" ").drop(
      t._3.split(" ").indexOf("<fim_middle>") + 1).nonEmpty))
    // negative ids: pmod keeps cuts in range — no negative-slice crash,
    // and the reassembly invariant still holds
    val neg = graft.ops.Packing.fimTransform(
        Seq((-5L, "a b c d e f")).toDF("doc_id", "text"), fimRate = 1.0)
      .as[(Long, Int, String)].collect().head
    assert(neg._2 == 1)
    val negToks = neg._3.split(" ").toSeq
    val np = negToks.indexOf("<fim_prefix>")
    val ns = negToks.indexOf("<fim_suffix>")
    val nm = negToks.indexOf("<fim_middle>")
    assert(negToks.slice(np + 1, ns) ++ negToks.drop(nm + 1) ++
      negToks.slice(ns + 1, nm) == Seq("a", "b", "c", "d", "e", "f"), neg._3)
  }

  test("lengthBucketBatches: smallest-fitting bucket, bounded batches, stable") {
    val docs = (1L to 60L).map(i =>
      (i, (0 until (i % 40 + 1).toInt).map(j => s"w$j").mkString(" ")))
      .toDF("doc_id", "text")
    val got = Packing.lengthBucketBatches(docs, Seq(8, 16, 32), batchSize = 4)
      .as[(Long, Int, Int, String, Int, Int)].collect()
    assert(got.length == 60) // exhaustive
    got.foreach { case (id, n, bucket, _, _, pos) =>
      // smallest edge >= n; > 32 tokens → overflow bucket
      val expected = Seq(8, 16, 32).find(n <= _).getOrElse(Int.MaxValue)
      assert(bucket == expected, (id, n, bucket))
      assert(pos >= 0 && pos < 4)
    }
    // batch ordinals are dense per (bucket, shard): positions 0..k for
    // every batch, only the LAST batch of a (bucket, shard) underfull
    got.groupBy(r => (r._3, r._4)).foreach { case ((b, sh), rows) =>
      val byBatch = rows.groupBy(_._5).toSeq.sortBy(_._1)
      byBatch.zipWithIndex.foreach { case ((bi, brows), k) =>
        assert(bi == k, s"batch ids not dense in ($b,$sh)")
        if (k < byBatch.size - 1) assert(brows.length == 4)
        assert(brows.map(_._6).sorted.toSeq == (0 until brows.length))
      }
    }
    // deterministic across runs
    val again = Packing.lengthBucketBatches(docs, Seq(8, 16, 32), batchSize = 4)
      .as[(Long, Int, Int, String, Int, Int)].collect()
    assert(again.sortBy(_._1).toSeq == got.sortBy(_._1).toSeq)
  }

  test("packedSequences: one trailing partial per partition, never more") {
    val docs = (1L to 40L).map(i => (i, s"t${i}a t${i}b t${i}c"))
      .toDF("doc_id", "text") // 120 tokens
    val got = Packing.packedSequences(docs, seqLen = 7, parts = 4)
      .as[(Long, Int, String)].collect().toSeq
    val byPart = got.groupBy(_._1 >> 32)
    byPart.foreach { case (p, seqs) =>
      assert(seqs.count(_._2 < 7) <= 1, s"partition $p: $seqs")
    }
    // token conservation across the whole corpus
    assert(got.map(_._2).sum == 120)
    // retry/layout stability
    val again = Packing.packedSequences(docs.repartition(13), 7, parts = 4)
      .as[(Long, Int, String)].collect().toSeq.sortBy(_._1)
    assert(again == got.sortBy(_._1))
  }

  test("chunkTokens plan is shuffle-free") {
    val doc = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val plan = Packing.chunkTokens(doc, 4, 2).queryExecution
      .executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("spanCorrupt: sentinel splice reconstructs the original stream") {
    val texts = (0L until 50L).map(i => (i, (0 until 37).map(t => s"w$t").mkString(" ")))
    val dd = (texts ++ Seq((99L, "short doc"), (98L, "")))
      .toDF("doc_id", "text")
    val got = Packing.spanCorrupt(dd, spanEvery = 16, spanLen = 3)
      .as[(Long, Long, Long, String, String)].collect()
    val sentinel = "<extra_id_(\\d+)>".r
    for ((id, n, nSpans, input, target) <- got) {
      // parse target: sentinel_i -> its hidden tokens
      val parts = sentinel.split(target).drop(1) // leading "" before <extra_id_0>
      val ids = sentinel.findAllMatchIn(target).map(_.group(1).toInt).toSeq
      assert(ids == (0L to nSpans).map(_.toInt), s"doc $id sentinels: $ids")
      val spans = ids.zip(parts.toSeq.map(_.trim) :+ "").toMap
      // splice each sentinel's span back into the input
      val rebuilt = sentinel.replaceAllIn(input,
        m => spans(m.group(1).toInt)).replaceAll("\\s+", " ").trim
      val orig = dd.where(org.apache.spark.sql.functions.col("doc_id") === id)
        .select("text")
        .as[String].head()
      val origToks = orig.toLowerCase.split("[^\\p{L}\\p{Nd}]+")
        .filter(_.nonEmpty).mkString(" ")
      assert(rebuilt == origToks, s"doc $id: '$rebuilt' != '$origToks'")
      // structural counts: one span per full 16-token window
      assert(nSpans == n / 16, s"doc $id")
      val inToks = input.split(" ").filter(_.nonEmpty).length
      assert(inToks == n - nSpans * 3 + nSpans, s"doc $id input len")
    }
    // short and empty docs: pass through with the bare closing sentinel
    val short = got.find(_._1 == 99L).get
    assert(short._3 == 0L && short._4 == "short doc" &&
      short._5 == "<extra_id_0>")
    val empty = got.find(_._1 == 98L).get
    assert(empty._2 == 0L && empty._4 == "" && empty._5 == "<extra_id_0>")
  }

  test("spanCorrupt: scan-stage only, no exchange in the plan") {
    val doc = Seq((1L, (0 until 40).map("t" + _).mkString(" ")))
      .toDF("doc_id", "text")
    val plan = Packing.spanCorrupt(doc).queryExecution
      .executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    // offsets differ across windows (the (i+1)·co-prime term working)
    val r = Packing.spanCorrupt(doc, spanEvery = 16, spanLen = 3)
      .as[(Long, Long, Long, String, String)].collect().head
    assert(r._3 == 2L)
  }

  test("paddingWaste: hand-checked batch algebra") {
    // batch (16,a,0): lens 10,2 -> max 10, padded 2*10-12 = 8
    // batch (16,a,1): len 5     -> padded 0
    val batches = Seq((16, "a", 0, 10), (16, "a", 0, 2), (16, "a", 1, 5))
      .toDF("bucket", "shard", "batch_idx", "n_tokens")
    val r = Packing.paddingWaste(batches, "p")
      .as[(String, Long, Long, Long, Long, Double)].collect().head
    assert(r == (("p", 2L, 3L, 17L, 8L, 0.32))) // 8/(8+17)
  }

  test("packByTokenBudget: shard ids keep their hash-route partition half " +
      "under a narrow downstream coalesce (round-15 oracle-caught bug)") {
    // pre-fix, TaskContext.getPartitionId() inside a coalesce(1) task
    // read 0 for EVERY pipelined parent partition, so (pid << 32) | seq
    // collided across partitions — exactly what any single-file writer
    // triggers. The pid must be the data-derived hash route.
    val docs = (0L until 200L)
      .map(i => (i, Seq.fill(30)("w").mkString(" "))).toDF("doc_id", "text")
    val rows = Packing.packByTokenBudget(docs, budget = 100, parts = 4)
      .coalesce(1)
      .as[(Long, Long, Long)].collect()
    assert(rows.length == 200)
    val pids = rows.map(_._3 >> 32).distinct.sorted.toSeq
    assert(pids.size > 1, s"fixture must span partitions, got $pids")
    // every embedded pid equals the row's hash route
    import org.apache.spark.sql.functions.{hash, lit, pmod}
    val routes = docs.select($"doc_id",
        pmod(hash($"doc_id"), lit(4)).cast("long").as("p"))
      .as[(Long, Long)].collect().toMap
    rows.foreach { case (id, _, sid) =>
      assert(sid >> 32 == routes(id), s"doc $id: ${sid >> 32} vs ${routes(id)}")
    }
    // budget honored per shard even after the coalesce (no cross-
    // partition merges): 30-token docs, budget 100 → ≤ 3 docs per shard
    rows.groupBy(_._3).foreach { case (sid, g) =>
      assert(g.map(_._2).sum <= 100, s"shard $sid over budget")
    }
  }

  test("paddingWaste: bucketing strictly beats one catch-all bucket " +
      "on a bimodal corpus") {
    val docs = ((1L to 16L).map(i => (i, "w " * 4)) ++
      (17L to 32L).map(i => (i, "w " * 120)))
      .map { case (i, t) => (i, t.trim) }.toDF("doc_id", "text")
    def waste(edges: Seq[Int]) =
      Packing.paddingWaste(
        Packing.lengthBucketBatches(docs, edges, batchSize = 4), "x")
        .as[(String, Long, Long, Long, Long, Double)].collect().head._6
    assert(waste(Seq(16, 128)) == 0.0) // same-length docs batch together
    assert(waste(Seq(1 << 20)) > 0.2)  // mixed batches pad shorts to 120
  }
}
