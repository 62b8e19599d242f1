package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def toks(rows: Seq[(Long, Long)]) =
    rows.toDF("doc_id", "n_tokens")

  test("exclusivePrefixSum matches the single-partition window (sparse ids)") {
    val rng = new scala.util.Random(7)
    // non-dense, clustered ids — bucket balance degrades, correctness must not
    val rows = (0 until 500).map(i =>
      (i.toLong * 17 + (if (i > 250) 100000L else 0L), rng.nextInt(200).toLong))
    val df = toks(rows).repartition(11)
    val got = Packing.exclusivePrefixSum(df, "doc_id", "n_tokens")
      .select("doc_id", "start").as[(Long, Long)].collect().toMap
    val w = Window.orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val want = toks(rows)
      .withColumn("start", coalesce(sum("n_tokens").over(w), lit(0L)))
      .select("doc_id", "start").as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("exclusivePrefixSum on empty input") {
    val out = Packing.exclusivePrefixSum(
      toks(Seq.empty), "doc_id", "n_tokens")
    assert(out.count() == 0)
  }

  test("chunkSpans partitions every doc's tokens and fills every cut exactly") {
    val rng = new scala.util.Random(3)
    val rows = (0L until 300L).map(i => (i, rng.nextInt(300).toLong))
    val total = rows.map(_._2).sum
    val L = 128
    val spans = Packing.chunkSpans(toks(rows), seqLen = L).cache()

    // every doc's contributed tokens sum to its count (zero-token docs absent)
    val perDoc = spans.groupBy("doc_id").agg(sum("n_tok").as("s"))
      .as[(Long, Long)].collect().toMap
    rows.foreach { case (id, n) =>
      assert(perDoc.getOrElse(id, 0L) == n, s"doc $id")
    }
    // every sequence holds exactly L tokens except the last partial one
    val perSeq = spans.groupBy("seq_id").agg(sum("n_tok").as("s"))
      .as[(Long, Long)].collect().sortBy(_._1)
    val lastSeq = (total - 1) / L
    perSeq.foreach { case (sid, s) =>
      if (sid < lastSeq) assert(s == L, s"seq $sid has $s tokens")
      else assert(s == total - lastSeq * L)
    }
    assert(perSeq.map(_._1).toSeq == (0L to lastSeq))
    // offsets are consistent: within a sequence, slices tile [0, L)
    val bad = spans.groupBy("seq_id")
      .agg(min("off_in_seq").as("mn"), sum("n_tok").as("s"),
        max(col("off_in_seq") + col("n_tok")).as("mx"))
      .where(col("mn") =!= 0 || col("mx") =!= col("s")).count()
    assert(bad == 0, "slices must tile each sequence contiguously from 0")
  }

  test("chunkSpans is partitioning-independent") {
    val rows = (0L until 200L).map(i => (i, (i % 37) + 1))
    val a = Packing.chunkSpans(toks(rows), 64).collect().toSet
    val b = Packing.chunkSpans(toks(rows).repartition(17), 64).collect().toSet
    assert(a == b)
  }

  test("nextFit: bins respect the budget, docs appear once, deterministic") {
    val rng = new scala.util.Random(11)
    val rows = (0L until 400L).map(i => (i, rng.nextInt(120).toLong))
    val budget = 256L
    val out = Packing.nextFit(toks(rows), budget, groups = 8).cache()
    assert(out.count() == 400)
    // no bin exceeds the budget unless it holds a single oversized doc
    val over = out.groupBy("grp", "bin")
      .agg(sum("n_tokens").as("s"), count(lit(1)).as("c"))
      .where(col("s") > budget && col("c") > 1).count()
    assert(over == 0)
    // deterministic across partitionings
    val again = Packing.nextFit(toks(rows).repartition(13), budget, groups = 8)
      .collect().toSet
    assert(again == out.collect().toSet)
  }

  test("nextFit: an oversized doc occupies exactly one bin of its own") {
    val rows = Seq((0L, 10L), (8L, 999L), (16L, 10L)) // all in group 0
    val out = Packing.nextFit(toks(rows), budget = 100L, groups = 8)
      .select("doc_id", "bin").as[(Long, Long)].collect().toMap
    assert(out(0L) == 0L && out(8L) == 1L && out(16L) == 2L)
  }

  test("export composition invariants: dedup, conservation, shuffle, shards") {
    import org.apache.spark.sql.functions._
    // mirrors the pipeline_export_train catalog stages on a fixture
    // small enough to check every invariant by hand
    val docs = graft.io.Tables.load(spark, sf("0.001"), "documents")
      .select(col("doc_id"), col("text"))
    val planted = docs.where(col("doc_id") < 5)
      .select((col("doc_id") + 100000L).as("doc_id"), col("text"))
    val uniq = Dedup.exactDedup(docs.unionByName(planted))
    // planted exact dups are gone; all original survivors remain
    assert(uniq.count() == docs.count())
    assert(uniq.where(col("doc_id") >= 100000L).count() == 0)
    val counted = uniq.select(col("doc_id"),
      size(split(col("text"), "\\s+")).cast("long").as("n_tokens"))
    val packed = Packing.chunkSpans(counted, seqLen = 128).localCheckpoint()
    // token conservation: each doc's chunk pieces sum to its count
    val bad = packed.groupBy("doc_id").agg(sum("n_tok").as("got"))
      .join(counted, Seq("doc_id"))
      .where(col("got") =!= col("n_tokens")).count()
    assert(bad == 0L)
    val seqs = packed.select(col("seq_id")).distinct()
      .withColumn("__hk", Dedup.md5Hash60(col("seq_id").cast("string")))
      .withColumn("__one", lit(1L))
    val positioned = Packing
      .exclusivePrefixSum(seqs, "__hk", "__one", outCol = "pos")
      .select(col("seq_id"), col("pos"),
        pmod(col("pos"), lit(8L)).as("shard"),
        expr("pos div 8").as("shard_pos"))
      .as[(Long, Long, Long, Long)].collect().toSeq
    val nSeq = positioned.size
    // pos is a permutation of 0..n-1 and equals the hash-order rank
    assert(positioned.map(_._2).sorted == (0L until nSeq).toSeq)
    def hk(s: String): Long = { // independent md5-60 reference
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
    }
    val hashOrder = positioned
      .sortBy(p => (hk(p._1.toString), p._1))
      .map(_._1)
    assert(positioned.sortBy(_._2).map(_._1) == hashOrder)
    // round-robin dealing: shard sizes differ by at most 1, and
    // (shard, shard_pos) is 1:1 with pos
    val sizes = positioned.groupBy(_._3).view.mapValues(_.size).values.toSeq
    assert(sizes.max - sizes.min <= 1)
    assert(positioned.forall { case (_, pos, sh, sp) =>
      sh == pos % 8 && sp == pos / 8 })
  }

  test("semantic packing: stream ordered by cluster, token mass conserved") {
    // the catalog composition (in-context packing, Shi et al. 2024):
    // reading the packed stream back in (seq_id, off_in_seq) order must
    // yield documents in non-decreasing CELL order — the property that
    // puts related docs in the same training window — and every doc
    // token must land in exactly one span
    val rows = graft.SparkEntry.queries("pack_semantic")(
      spark, sf("0.001"))
      .select("seq_id", "doc_id", "cell", "off_in_seq", "n_tok")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(rows.nonEmpty)
    val streamCells = rows.sortBy(r => (r._1, r._4)).map(_._3)
    assert(streamCells.zip(streamCells.tail).forall { case (a, b) => a <= b },
      "cells must be non-decreasing along the packed stream")
    assert(streamCells.distinct.size > 1,
      "fixture must exercise more than one cell")
    // conservation: per-doc span masses sum to the doc's token count
    val docs = spark.read
      .parquet(sf("0.001") + "/documents.parquet")
      .select(col("doc_id"),
        size(split(col("text"), "\\s+")).cast("long").as("n"))
      .as[(Long, Long)].collect().toMap
    rows.groupBy(_._2).foreach { case (id, sp) =>
      assert(sp.map(_._5).sum == docs(id), s"doc $id token mass")
    }
    // every sequence except the last is exactly full
    val seqTok = rows.groupBy(_._1).view.mapValues(_.map(_._5).sum)
    val lastSeq = seqTok.keys.max
    seqTok.foreach { case (sq, n) =>
      if (sq != lastSeq) assert(n == 128L, s"seq $sq not full: $n")
    }
  }
}
