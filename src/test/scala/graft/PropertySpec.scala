package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean
import scala.concurrent.duration._
import graft.ingest.{CsvIO, Retry}
import graft.model.Status

/** Property-based invariants (SURVEY §5): status derivation is a total
  * function with consistent semantics, backoff is monotone geometric,
  * CSV row counting matches construction, retry honors its budget.
  */
object PropertySpec extends Properties("graft") {

  private val counts = Gen.choose(0L, 10000L)

  property("status.derive is total and consistent") =
    Prop.forAll(counts, counts) { (ok: Long, fail: Long) =>
      val s = Status.derive(ok, fail)
      val total = Set(Status.Success, Status.PartialSuccess, Status.Failed).contains(s)
      val semantics =
        if (fail == 0) s == Status.Success
        else if (ok == 0) s == Status.Failed
        else s == Status.PartialSuccess
      total && semantics
    }

  property("status.normalize == derive when counts are complete") =
    Prop.forAll(Gen.choose(0L, 5000L), Gen.choose(0L, 5000L)) { (ok: Long, fail: Long) =>
      (ok + fail > 0) ==>
        (Status.normalize("RUNNING", ok + fail, ok, fail) == Status.derive(ok, fail))
    }

  property("backoff is geometric from base") =
    Prop.forAll(Gen.choose(1, 20), Gen.choose(1L, 10000L)) { (attempt: Int, baseMs: Long) =>
      val base = baseMs.millis
      Retry.backoffDelay(base, attempt + 1) == Retry.backoffDelay(base, attempt) * 2 &&
        Retry.backoffDelay(base, 1) == base
    }

  // the Exact.qLong contract (NUMERICS.md Class G): for any GRID-RESIDENT
  // value — the nearest double to k/10^s — the pure-double snap
  // ⌊x·10^s + 0.5⌋ recovers exactly k, either sign, across the money
  // magnitude envelope (|k| ≲ 2^50 keeps the accumulated ulp error far
  // inside the ±0.5 window)
  property("grid snap recovers the exact scaled integer (either sign)") =
    Prop.forAll(Gen.choose(-999999999999L, 999999999999L), Gen.choose(0, 6)) {
      (k: Long, s: Int) =>
        val scale = math.pow(10, s)
        val v = k / scale // nearest double to the grid point k·10^−s
        math.floor(v * scale + 0.5).toLong == k
    }

  // the Exact.sumQLR re-round: integer ⌊(S + d/2)/d⌋ over a NON-NEGATIVE
  // scaled sum equals BigDecimal HALF_UP at the target scale
  property("integer HALF_UP re-round matches BigDecimal HALF_UP") =
    Prop.forAll(Gen.choose(0L, 4000000000000000000L), Gen.choose(1, 6)) {
      (sSum: Long, sMinusR: Int) =>
        val down = math.pow(10, sMinusR).toLong
        val intForm = (sSum + down / 2) / down
        val bdForm = new java.math.BigDecimal(sSum)
          .divide(new java.math.BigDecimal(down), 0, java.math.RoundingMode.HALF_UP)
          .longValueExact()
        intForm == bdForm
    }

  property("countCsvRows matches construction") =
    Prop.forAll(Gen.choose(0, 50), Gen.oneOf(true, false)) { (n: Int, trailing: Boolean) =>
      val lines = "h1,h2,h3" +: (1 to n).map(i => s"v$i,a,b")
      val text = lines.mkString("\n") + (if (trailing) "\n" else "")
      CsvIO.countCsvRows(text) == n
    }

  property("retry attempts bounded by budget; sleeps are the geometric prefix") =
    Prop.forAll(Gen.choose(1, 6), Gen.choose(0, 10)) { (maxRetries: Int, failures: Int) =>
      var sleeps = Vector.empty[FiniteDuration]
      var calls = 0
      val result = scala.util.Try {
        Retry.retry(maxRetries, 1.second, sleeps :+= _) { _ =>
          calls += 1
          if (calls <= failures) throw Retry.RetriableFailure("x")
          calls
        }
      }
      val budget = calls <= maxRetries
      val outcome =
        if (failures >= maxRetries)
          result.isFailure && calls == maxRetries &&
            sleeps == (1 until maxRetries).map(i => Retry.backoffDelay(1.second, i)).toVector
        else
          result.isSuccess && calls == failures + 1 &&
            sleeps == (1 to failures).map(i => Retry.backoffDelay(1.second, i)).toVector
      budget && outcome
    }

  property("probeSubsets: first is the exact bucket, all distinct, within m, penalty-ordered") =
    Prop.forAll(Gen.choose(1, 32), Gen.choose(1, 5)) { (nProbes: Int, m: Int) =>
      val subs = graft.ext.Similarity.probeSubsets(nProbes, m)
      val weights = subs.map(_.map(_ + 1).sum)
      subs.head.isEmpty &&
        subs.size == math.min(math.max(nProbes, 1), 1 << m) &&
        subs.map(_.toSet).distinct.size == subs.size &&
        subs.forall(_.forall(p => p >= 0 && p < m)) &&
        weights == weights.sorted
    }

  property("minhashCoeffs: a in [1,P), b in [0,P), deterministic for a seed") =
    Prop.forAll(Gen.choose(1, 64), Gen.choose(0L, 1000L)) { (n: Int, seed: Long) =>
      val p = graft.ext.Dedup.MinhashP
      val c1 = graft.ext.Dedup.minhashCoeffs(n, seed)
      val c2 = graft.ext.Dedup.minhashCoeffs(n, seed)
      c1 == c2 && c1.size == n &&
        c1.forall { case (a, b) => a >= 1 && a < p && b >= 0 && b < p }
    }

  // hostile-input fuzz for the zero-dep container walkers: crawled media
  // is adversarial by default, so the probes must be total functions —
  // never throw, never hang, and any structure they DO claim must point
  // inside the payload
  private val rawBytes: Gen[Array[Byte]] =
    Gen.containerOf[Array, Byte](Gen.choose(Byte.MinValue, Byte.MaxValue))
  private val riffHeaded: Gen[Array[Byte]] = for {
    form <- Gen.oneOf("AVI ", "WAVE", "XXXX")
    // include the crafted near-2^32 sizes that would walk backwards if
    // ever reinterpreted as a negative Int
    szBytes <- Gen.oneOf(
      Gen.containerOfN[Array, Byte](4, Gen.choose(Byte.MinValue, Byte.MaxValue)),
      Gen.const(Array(0xF8.toByte, 0xFF.toByte, 0xFF.toByte, 0xFF.toByte)))
    tail <- rawBytes
  } yield "RIFF".getBytes("US-ASCII") ++ szBytes ++
    form.getBytes("US-ASCII") ++ tail

  property("aviMjpegFrames: total on arbitrary bytes; claimed frames are in-bounds JPEG starts") =
    Prop.forAll(Gen.oneOf(rawBytes, riffHeaded)) { p =>
      graft.ext.Multimodal.aviMjpegFrames(p) match {
        case None => true
        case Some(frames) => frames.nonEmpty && frames.forall { f =>
          f.length >= 2 && (f(0) & 0xFF) == 0xFF && (f(1) & 0xFF) == 0xD8 &&
            f.length <= p.length
        }
      }
    }

  property("wavMeta: total on arbitrary bytes; claimed data chunk is in-bounds") =
    Prop.forAll(Gen.oneOf(rawBytes, riffHeaded)) { p =>
      graft.ext.Multimodal.wavMeta(p) match {
        case None => true
        case Some((_, ch, bits, _, dataOff, dataLen, _)) =>
          ch > 0 && bits > 0 && dataOff >= 12 && dataLen >= 0 &&
            dataOff.toLong + dataLen <= p.length
      }
    }

  property("secrets: exactly the missing/blank required keys are reported") =
    Prop.forAll(Gen.someOf(graft.run.Secrets.RequiredKeys),
        Gen.someOf(graft.run.Secrets.RequiredKeys)) { (present, blank) =>
      val store = present.map(k => k -> s"v-$k").toMap ++ blank.map(_ -> "").toMap
      val expectedMissing = graft.run.Secrets.RequiredKeys
        .filterNot(k => store.get(k).exists(_.nonEmpty))
      scala.util.Try(graft.run.Secrets.load(store.get)) match {
        case scala.util.Success(loaded) =>
          expectedMissing.isEmpty &&
            loaded(graft.run.Secrets.TokenUrlKey) == graft.run.Secrets.DefaultTokenUrl
        case scala.util.Failure(e: graft.run.Secrets.MissingSecrets) =>
          e.keys == expectedMissing
        case _ => false
      }
    }
}
