package graft.props

import org.scalacheck.{Gen, Properties, Prop}
import org.scalacheck.Prop.forAll
import graft.index.{Codebook, CodebookAligner}
import graft.search.CodebookBeamSearch

/** Property-based invariants (SURVEY §5): quantizer assignment is argmin
  * with residual subtraction, reconstruction is the centroid sum, alignment
  * recovers permutations, beam scores are sorted. Pure-JVM properties —
  * the Spark-side counterparts are pinned in the ScalaTest suites.
  */
object InvariantProps extends Properties("graft.invariants") {

  private val dim = 8

  private val genVec: Gen[Array[Float]] =
    Gen.containerOfN[Array, Float](dim, Gen.choose(-4.0f, 4.0f))

  private val genCodebook: Gen[Codebook] = for {
    levels <- Gen.choose(1, 3)
    k <- Gen.choose(2, 6)
    cents <- Gen.containerOfN[Array, Array[Array[Float]]](levels,
      Gen.containerOfN[Array, Array[Float]](k, genVec))
  } yield Codebook(cents)

  private def l2sq(a: Array[Double], b: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  property("assign is per-level argmin with residual subtraction") =
    forAll(genCodebook, genVec) { (cb, v) =>
      val codes = cb.assign(v)
      val resid = v.map(_.toDouble)
      codes.indices.forall { m =>
        val dists = cb.levels(m).map(c => l2sq(resid, c))
        val ok = dists(codes(m)) == dists.min
        val cent = cb.levels(m)(codes(m))
        resid.indices.foreach(j => resid(j) -= cent(j))
        ok
      }
    }

  property("reconstruct(codes) = Σ centroids") =
    forAll(genCodebook, genVec) { (cb, v) =>
      val codes = cb.assign(v)
      val rec = cb.reconstruct(codes)
      val expect = new Array[Float](cb.dim)
      codes.indices.foreach { m =>
        val c = cb.levels(m)(codes(m))
        expect.indices.foreach(j => expect(j) += c(j))
      }
      rec.toSeq == expect.toSeq
    }

  property("aligner recovers any permutation exactly") =
    forAll(genCodebook) { cb =>
      val k = cb.k
      val perm = scala.util.Random.shuffle((0 until k).toList).toArray
      val shuffled = Codebook(cb.levels.map(level => perm.map(level)))
      val aligned = CodebookAligner.alignCodebook(cb, shuffled)
      // distinct centroids realign exactly; degenerate duplicates may swap,
      // which is still cost-optimal — compare cost, not identity
      val costAligned = cb.levels.zip(aligned.levels).map { case (o, a) =>
        o.zip(a).map { case (x, y) =>
          x.zip(y).map { case (p, q) => (p - q) * (p - q) }.sum }.sum
      }.sum
      costAligned <= 1e-6
    }

  property("beam search scores are non-increasing and codes in range") =
    forAll(genCodebook, genVec, Gen.choose(1, 8)) { (cb, v, beams) =>
      val out = CodebookBeamSearch.searchOne(cb, v, beams)
      val scoresSorted = out.map(_._2).sliding(2).forall {
        case Array(a, b) => a >= b
        case _ => true
      }
      val codesValid = out.forall(_._1.forall(c => c >= 0 && c < cb.k))
      val lengths = out.forall(_._1.length == cb.numLevels)
      Prop(scoresSorted && codesValid && lengths &&
        out.length == math.min(beams, math.pow(cb.k, cb.numLevels).toInt))
    }

  property("exhaustive beam (K^M) includes the greedy assignment path") =
    forAll(genCodebook, genVec) { (cb, v) =>
      val all = math.pow(cb.k, cb.numLevels).toInt
      val out = CodebookBeamSearch.searchOne(cb, v, all)
      out.exists(_._1.toSeq == cb.assign(v).toSeq)
    }

  property("Hungarian assignment never costs more than greedy") =
    forAll(genCodebook) { cb =>
      def total(old: Array[Array[Float]], fresh: Array[Array[Float]],
          perm: Array[Int]): Double =
        perm.indices.map { n =>
          fresh(n).zip(old(perm(n)))
            .map { case (a, b) => (a.toDouble - b) * (a.toDouble - b) }.sum
        }.sum
      cb.levels.forall { level =>
        val fresh = scala.util.Random.shuffle(level.toList).toArray
          .map(_.map(f => f + 0.01f))
        val g = total(level, fresh, CodebookAligner.align(level, fresh))
        val h = total(level, fresh, CodebookAligner.alignOptimal(level, fresh))
        h <= g + 1e-9
      }
    }

  property("do_sample beam is a pure function of (seed, salt) with valid output") =
    forAll(genCodebook, genVec, Gen.choose(1, 6), Gen.choose(0L, 1000L),
      Gen.alphaNumStr) { (cb, v, beams, seed, salt) =>
      val a = CodebookBeamSearch.searchOne(cb, v, beams,
        doSample = true, sampleSeed = seed, salt = salt)
      val b = CodebookBeamSearch.searchOne(cb, v, beams,
        doSample = true, sampleSeed = seed, salt = salt)
      val same = a.map(t => (t._1.toSeq, t._2)).toSeq ==
        b.map(t => (t._1.toSeq, t._2)).toSeq
      val valid = a.forall(t => t._1.length == cb.numLevels &&
        t._1.forall(c => c >= 0 && c < cb.k))
      Prop(same && valid &&
        a.length == math.min(beams, math.pow(cb.k, cb.numLevels).toInt))
    }

  private val genPqCodebook: Gen[graft.index.PQCodebook] = for {
    numSub <- Gen.oneOf(1, 2, 4)
    k <- Gen.choose(2, 6)
    subs <- Gen.containerOfN[Array, Array[Array[Float]]](numSub,
      Gen.containerOfN[Array, Array[Float]](k,
        Gen.containerOfN[Array, Float](dim / numSub, Gen.choose(-4.0f, 4.0f))))
  } yield graft.index.PQCodebook(subs)

  property("PQ assign is the independent per-slice argmin") =
    forAll(genPqCodebook, genVec) { (cb, v) =>
      val codes = cb.assign(v)
      val sd = cb.subDim
      codes.indices.forall { m =>
        val slice = v.slice(m * sd, (m + 1) * sd).map(_.toDouble)
        val dists = cb.subs(m).map(c => l2sq(slice, c))
        dists(codes(m)) == dists.min
      }
    }

  property("PQ reconstruct is the exact concatenation of chosen centroids") =
    forAll(genPqCodebook, genVec) { (cb, v) =>
      val codes = cb.assign(v)
      val rec = cb.reconstruct(codes)
      val sd = cb.subDim
      rec.length == cb.dim && rec.indices.forall { i =>
        rec(i) == cb.subs(i / sd)(codes(i / sd))(i % sd)
      }
    }

  property("PQ float and double assignment agree on float-valued input") =
    forAll(genPqCodebook, genVec) { (cb, v) =>
      cb.assign(v).toSeq == cb.assignDouble(v.map(_.toDouble)).toSeq
    }

  private val genPyString: Gen[String] =
    Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar,
      2 -> Gen.oneOf('\'', '"', '\\', ' ', ',', '[', ']'))).map(_.mkString)

  property("python-literal parser inverts repr() rendering") =
    forAll(Gen.listOf(genPyString)) { elems =>
      // python repr of a string list: single quotes, escape \ and '
      val rendered = elems.map { s =>
        "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"
      }.mkString("[", ", ", "]")
      graft.io.PyLiteral.parseStringList(rendered).contains(elems)
    }
}
