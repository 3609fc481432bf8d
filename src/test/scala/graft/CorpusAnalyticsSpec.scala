package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.ops.TextAnalysis
import graft.streaming.EventAggs

/** Round-5 corpus/analytics operators: funnel staging, stratified
  * sampling, length-bucket histograms, repetition scoring, and the
  * non-vacuous PII audit. The DuckDB oracles pin cross-engine parity on
  * the fixture; these pin the SEMANTICS on constructed inputs where each
  * edge (out-of-window click, click-before-view, sub-n-gram doc, …) is
  * placed deliberately.
  */
class CorpusAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("boilerplate census: shared chunks flagged per language; partial " +
    "tails and short docs excluded; per-doc share exact") {
    val docs = Seq(
      // three docs share the exact 4-token chunk "a b c d" (>= minDf 3);
      // doc 4 shares it but in language de (censused separately, df 1);
      // doc 5 has 9 tokens -> 2 full chunks + a dropped 1-token tail;
      // doc 6 is 3 tokens long -> no full chunk, absent from the report
      (1L, "a b c d x1 x2 x3 x4", "en"),
      (2L, "a b c d y1 y2 y3 y4", "en"),
      (3L, "a b c d z1 z2 z3 z4", "en"),
      (4L, "a b c d w1 w2 w3 w4", "de"),
      (5L, "a b c d a b c d tail", "en"),
      (6L, "too short doc", "en")).toDF("doc_id", "text", "lang")
    val census = TextAnalysis.boilerplateChunks(docs, minDf = 3)
      .as[(String, String, Long)].collect().toSeq
    // doc 5's duplicate chunk counts ONCE per doc (distinct), so df = 4
    assert(census == Seq(("en", "a b c d", 4L)))
    val share = TextAnalysis.boilerplateShare(docs, minDf = 3)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // doc 5: 2 chunk rows but "a b c d" twice -> 1 DISTINCT chunk, all
    // boilerplate -> share 1.0; docs 1-3: 2 chunks, 1 boilerplate -> 0.5
    assert(share(5L) == ((1L, 1L, 1.0)))
    assert(share(1L) == ((2L, 1L, 0.5)))
    assert(share(4L) == ((2L, 0L, 0.0))) // de census never reaches minDf
    assert(!share.contains(6L))
  }

  test("joinKeySkew: hand-computed skew factor, hot-key tie-break, salt") {
    val fact = (Seq.fill(6)(10L) ++ Seq.fill(6)(20L) ++
      Seq(30L, 30L, 30L, 40L)).toDF("k")
    val got = graft.ops.Layout.joinKeySkew(fact, col("k"))
      .as[(Long, Long, Long, Long, Double, Double, Long)].collect().head
    // 16 rows, 4 keys, max 6 (keys 10 and 20 tie -> hot_key = 10),
    // hot_share 6/16 = 0.375, skew = 6*4/16 = 1.5, salt = ceil(1.5) = 2
    assert(got == ((16L, 4L, 10L, 6L, 0.375, 1.5, 2L)))
  }

  test("sqErrorAudit: exact integer error accounting matches a Scala " +
    "recomputation of the same quantizer") {
    val vecs = Seq(
      (0L, Array(0.0f, 1.0f), 1),
      (1L, Array(0.5f, -1.0f), 1),
      (2L, Array(1.0f, 0.25f), 2))
    val df = vecs.toDF("vec_id", "embedding", "label")
    val got = graft.ops.Similarity.sqErrorAudit(df)
      .as[(Int, Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    // recompute the audit in plain Scala: per-dim (mn, span) over the
    // DOUBLE-cast values, q = round(d*255/span), xq = mn + q*span/255
    val cols = vecs.map(_._2.map(_.toDouble))
    val errsByLabel = vecs.zip(cols).flatMap { case ((_, _, lbl), v) =>
      v.indices.map { i =>
        val xs = cols.map(_(i))
        val (mn, mx) = (xs.min, xs.max)
        val span = mx - mn
        val xq = if (span == 0) mn
          else mn + math.round((v(i) - mn) * 255 / span).toDouble * span / 255
        lbl -> math.floor(math.abs(v(i) - xq) * 1e6).toLong
      }
    }.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    for ((lbl, errs) <- errsByLabel) {
      val (n, s, mx2, sq) =
        (errs.size.toLong, errs.sum, errs.max, errs.map(e => e * e).sum)
      assert(got(lbl) == ((lbl, n, s, mx2, sq, s.toDouble / n.toDouble)),
        s"label $lbl")
    }
  }

  test("funnel counts stages only in order and inside their windows") {
    val events = Seq(
      // u1: full conversion inside both windows
      (1L, "view", ts("2024-01-01 00:00:00")),
      (1L, "click", ts("2024-01-01 01:00:00")),
      (1L, "purchase", ts("2024-01-01 02:00:00")),
      // u2: view only
      (2L, "view", ts("2024-01-01 00:00:00")),
      // u3: click + purchase but never viewed -> counts only as a user
      (3L, "click", ts("2024-01-01 00:00:00")),
      (3L, "purchase", ts("2024-01-01 00:30:00")),
      // u4: click 20h after first view -> outside the 12h click window
      (4L, "view", ts("2024-01-01 00:00:00")),
      (4L, "click", ts("2024-01-01 20:00:00")),
      // u5: clicked in-window, purchase 60h later -> outside the 48h window
      (5L, "view", ts("2024-01-01 00:00:00")),
      (5L, "click", ts("2024-01-01 01:00:00")),
      (5L, "purchase", ts("2024-01-03 13:00:00")),
      // u6: click BEFORE the first view never qualifies (order matters),
      // so the later purchase has no qualifying click to anchor on
      (6L, "click", ts("2023-12-31 23:00:00")),
      (6L, "view", ts("2024-01-01 00:00:00")),
      (6L, "purchase", ts("2024-01-01 01:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val row = EventAggs.funnel(events).as[(Long, Long, Long, Long)].head()
    assert(row == ((6L, 5L, 2L, 1L)))
  }

  test("funnel anchors on the FIRST view, not any view") {
    val events = Seq(
      // first view at 00:00; click at 20:00 is outside 12h of it even
      // though a SECOND view at 19:00 would put it in range
      (1L, "view", ts("2024-01-01 00:00:00")),
      (1L, "view", ts("2024-01-01 19:00:00")),
      (1L, "click", ts("2024-01-01 20:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val row = EventAggs.funnel(events).as[(Long, Long, Long, Long)].head()
    assert(row == ((1L, 1L, 0L, 0L)))
  }

  test("stratifiedSample takes exactly ceil(fraction * n) per stratum, deterministically") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val perLang = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    val sampled = TextAnalysis.stratifiedSample(docs, 0.1)
    val got = sampled.groupBy("lang").count().as[(String, Long)].collect().toMap
    perLang.foreach { case (lang, n) =>
      assert(got(lang) == math.ceil(n * 0.1).toLong, s"stratum $lang")
    }
    // stable under physical repartitioning (md5 order, not partition order)
    val again = TextAnalysis.stratifiedSample(docs.repartition(7), 0.1)
      .as[(Long, String)].collect().toSet
    assert(again == sampled.as[(Long, String)].collect().toSet)
  }

  test("lengthBuckets is exact at power-of-two boundaries") {
    val docs = Seq(
      (1L, "a"), (2L, "a b"), (3L, "a b c"), (4L, "a b c d"),
      (5L, "a b c d e f g"), (6L, "a b c d e f g h")
    ).toDF("doc_id", "text")
    val rows = TextAnalysis.lengthBuckets(docs)
      .as[(Long, Long, Int, Int)].collect()
      .map { case (lo, n, mn, mx) => lo -> ((n, mn, mx)) }.toMap
    // 1 -> [1], 2 -> [2,3], 4 -> [4..7], 8 -> [8]
    assert(rows == Map(
      1L -> ((1L, 1, 1)), 2L -> ((2L, 2, 3)),
      4L -> ((2L, 4, 7)), 8L -> ((1L, 8, 8))))
  }

  test("repetition scores repeated n-grams and excludes sub-n docs") {
    val docs = Seq(
      (1L, "a b a b a b"),   // trigrams: aba, bab, aba, bab -> 4 total, 2 distinct
      (2L, "w x y z"),       // trigrams: wxy, xyz -> no repeats
      (3L, "a b")            // shorter than n=3: excluded
    ).toDF("doc_id", "text")
    val rows = TextAnalysis.repetition(docs)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(rows == Map(1L -> ((4L, 2L, 0.5)), 2L -> ((2L, 2L, 0.0))))
  }

  test("sampleWeighted: higher scale strictly widens the sample; quality-monotone") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val small = TextAnalysis.sampleWeighted(docs, 0.2)
      .select("doc_id").as[Long].collect().toSet
    val large = TextAnalysis.sampleWeighted(docs, 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(small.nonEmpty && small.subsetOf(large),
      "the same md5 threshold with a larger scale must keep a superset")
  }

  test("mixPlan caps rates at 1.0 and derives expected docs from actual sizes") {
    val docs = Seq.tabulate(40)(i =>
      (i.toLong, "w " * 5, if (i < 30) "big" else "small"))
      .toDF("doc_id", "text", "source")
    // N=40: big has 30 docs, small 10. share(big)=0.25 -> 10 expected,
    // rate 10/30; share(small)=0.5 -> 20 wanted but only 10 exist -> rate 1.0
    val plan = TextAnalysis.mixPlan(docs, Seq("big" -> 0.25, "small" -> 0.5))
      .as[(String, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._4, r._5))).toMap
    assert(plan("big") == ((30L, 0.333333, 10.0)))
    assert(plan("small") == ((10L, 1.0, 10.0)))
  }

  test("mixApply realizes the plan: draws match a manual threshold filter " +
    "and zero-draw sources still appear") {
    val docs = Seq.tabulate(40)(i =>
      (i.toLong, "w " * 5, if (i < 30) "big" else "small"))
      .toDF("doc_id", "text", "source")
    val applied = TextAnalysis.mixApply(docs, Seq("big" -> 0.25, "small" -> 0.5))
      .as[(String, Long, Double, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // small samples at rate 1.0: every doc survives the threshold
    assert(applied("small") == ((10L, 1.0, 10L)))
    // big at rate 10/30: reproduce the draw with the same md5 unit
    val expectBig = docs.filter(col("source") === "big")
      .filter(conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("double") / 65536.0 < lit(0.333333)).count()
    assert(applied("big")._3 == expectBig)
    // a source whose rate draws nothing still appears with 0 (the audit
    // row a silent-miss bug would need to suppress)
    val one = Seq((99L, "w", "tiny")).toDF("doc_id", "text", "source")
    val docs2 = docs.union(one)
    val applied2 = TextAnalysis
      .mixApply(docs2, Seq("big" -> 0.25, "small" -> 0.5, "tiny" -> 0.000001))
      .as[(String, Long, Double, Long)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(applied2.contains("tiny"))
  }

  test("bpeMerges runs greedy deterministic merges with left-to-right application") {
    // corpus: "abab" x3, "abc" x2  ->  char pairs weighted by word freq:
    //   (a,b): 3*2 + 2*1 = 8   <- merge 1 = "ab"
    //   (b,a): 3, (b,c): 2
    // after merge 1: "abab" -> [ab,ab], "abc" -> [ab,c]
    //   (ab,ab): 3, (ab,c): 2 -> merge 2 = "abab"
    // after merge 2: vocab = [abab], [ab,c] -> merge 3 = (ab,c) weight 2
    val docs = Seq(
      (1L, "abab abab abab abc abc")
    ).toDF("doc_id", "text")
    val merges = graft.ops.TextAnalysis.bpeMerges(docs, iters = 3)
    assert(merges == Seq(
      (1, "a", "b", 8L), (2, "ab", "ab", 3L), (3, "ab", "c", 2L)))
  }

  test("epochPlan: epochs = needed/available; scarce sources flag " +
    "upsampled") {
    // big: 9 docs x 10 tokens = 90; small: 1 doc x 10 tokens = 10.
    // budget = 0.5 x 100 = 50 tokens; both target 50% -> needed 25 each:
    // big epochs 25/90, small 25/10 = 2.5 (upsampled)
    val docs = (Seq.fill(9)("big") :+ "small").zipWithIndex.map {
      case (src, i) => (i.toLong, Seq.fill(10)("w").mkString(" "), src)
    }.toDF("doc_id", "text", "source")
    val got = graft.ops.TextAnalysis
      .epochPlan(docs, Seq("big" -> 0.5, "small" -> 0.5))
      .as[(String, Long, Long, Double, Double, Double, Boolean)].collect()
      .map(r => r._1 -> ((r._3, r._5, r._6, r._7))).toMap
    assert(got("big") == ((90L, 25.0, 0.277778, false)))
    assert(got("small") == ((10L, 25.0, 2.5, true)))
  }

  test("bpeEncode applies the learned merges: encoded token counts equal " +
    "the training-time final symbolization") {
    // same corpus as the bpeMerges test: merges (a,b), (ab,ab), (ab,c) —
    // so "abab" encodes to [abab] (1 token) and "abc" to [abc] (1 token)
    val docs = Seq((1L, "abab abab abab abc abc")).toDF("doc_id", "text")
    val got = graft.ops.TextAnalysis.bpeEncode(docs, iters = 3)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == Map(
      "abab" -> ((3L, 4L, 1L)), // freq 3, 4 chars, 1 token
      "abc" -> ((2L, 3L, 1L))))
    // fewer merges encode less: with only merge 1 ("ab"), abab -> [ab,ab]
    val got1 = graft.ops.TextAnalysis.bpeEncode(docs, iters = 1)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(got1 == Map("abab" -> 2L, "abc" -> 2L))
  }

  test("bpeEncodeDocs: per-doc token mass and compression from the same " +
    "learned merges") {
    // merges (a,b), (ab,ab), (ab,c): "abab" -> 1 token, "abc" -> 1 token
    val docs = Seq(
      (1L, "abab abab abab abc abc"), // 5 words, 18 chars, 5 tokens
      (2L, "abab abc")                // 2 words, 7 chars, 2 tokens
    ).toDF("doc_id", "text")
    val got = graft.ops.TextAnalysis.bpeEncodeDocs(docs, iters = 3)
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got == Map(
      1L -> ((5L, 18L, 5L, 3.6)),
      2L -> ((2L, 7L, 2L, 3.5))))
  }

  test("bpeMerges greedy fold never merges overlapping occurrences") {
    // "aaaa" with merge (a,a): left-to-right gives [aa][aa], so iteration 2
    // must see pair (aa,aa) with weight 1 - an overlap-broken fold would
    // report (a,aa) or (aa,a) instead
    val docs = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val merges = graft.ops.TextAnalysis.bpeMerges(docs, iters = 2)
    assert(merges == Seq((1, "a", "a", 3L), (2, "aa", "aa", 1L)))
  }

  test("bpeLearn: the DataFrame face carries bpeMerges' rows verbatim") {
    val docs = Seq((1L, "abab abab abab abc abc")).toDF("doc_id", "text")
    val got = graft.ops.TextAnalysis.bpeLearn(docs, iters = 3)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(got == graft.ops.TextAnalysis.bpeMerges(docs, iters = 3))
    assert(graft.ops.TextAnalysis.bpeLearn(docs, iters = 3).columns.toSeq ==
      Seq("merge_rank", "lhs", "rhs", "weighted_count"))
  }

  test("incremental dedup separates corpus dups, in-batch dups, and new docs") {
    val existing = Seq((1L, "alpha beta"), (2L, "gamma delta")).toDF("doc_id", "text")
    val incoming = Seq(
      (10L, "alpha  BETA"),  // dup of existing 1 (fingerprint normalizes case/space)
      (11L, "epsilon zeta"), // genuinely new
      (12L, "epsilon zeta"), // dup of 11 within the batch
      (13L, "gamma delta")   // dup of existing 2
    ).toDF("doc_id", "text")
    val got = graft.ops.Dedup.incremental(existing, incoming)
      .as[(Long, Option[Long], Option[Long], Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == Map(
      10L -> ((Some(1L), None, false)),
      11L -> ((None, None, true)),
      12L -> ((None, Some(11L), false)),
      13L -> ((Some(2L), None, false))))
  }

  test("piiAudit redacts each woven span type exactly once per qualifying doc") {
    val docs = Seq(
      (0L, "plain words"),  // %3, %4, %5 all 0 -> email + ip + phone
      (1L, "plain words"),  // none
      (3L, "plain words"),  // email only
      (4L, "plain words"),  // ip only
      (5L, "plain words"),  // phone only
      (12L, "plain words")  // email + ip
    ).toDF("doc_id", "text")
    val got = TextAnalysis.piiAudit(docs)
      .select("doc_id", "n_pii").as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 3L, 1L -> 0L, 3L -> 1L, 4L -> 1L, 5L -> 1L, 12L -> 2L))
    // and no raw span survives redaction
    val leaked = TextAnalysis.piiAudit(docs)
      .filter(col("text_redacted").rlike("@example\\.com|10\\.0\\.|415 555"))
      .count()
    assert(leaked == 0)
  }

  test("dailyAnomalies: median/MAD flags the spike; a flat series has no scale") {
    def day(d: Int, typ: String, n: Int) =
      (1 to n).map(i => (typ, ts(f"2024-01-$d%02d 0${i % 9}:00:00")))
    // type a: flat 4 days of 10, then a 100-spike -> mad = 0
    val a = (1 to 4).flatMap(day(_, "a", 10)) ++ day(5, "a", 100)
    // type b: 1..5 ramp -> med 3, mad 1, nothing beyond 3 MADs
    val b = (1 to 5).flatMap(d => day(d, "b", d))
    val events = (a ++ b).toDF("event_type", "ts")
    val got = EventAggs.dailyAnomalies(events)
      .select("event_type", "d", "cnt", "robust_z", "is_anomaly")
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString) ->
        ((r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double]), r.getBoolean(4))))
      .toMap
    assert(got(("a", "2024-01-05")) == ((100L, None, true)),
      "flat-series spike: MAD 0 -> z undefined, still flagged")
    assert(got(("a", "2024-01-01")) == ((10L, None, false)))
    assert(got(("b", "2024-01-05"))._1 == 5L)
    assert(got(("b", "2024-01-05"))._2.contains(2.0))
    assert(EventAggs.dailyAnomalies(events)
      .filter(col("event_type") === "b" && col("is_anomaly")).count() == 0)
  }

  test("winsorize clamps exactly at the group's percentile bounds") {
    val rows = (1 to 20).map(v => (v.toLong, "g", v.toDouble)) :+
      ((21L, "h", 1000.0)) // singleton group: p05 = p95 = itself
    val df = rows.toDF("id", "grp", "x")
    val got = graft.ops.Features.winsorize(df, "grp", "x", idCols = Seq("id"))
      .select("id", "clamped").as[(Long, Double)].collect().toMap
    assert(got(1L) == 1.95)   // 1 + 0.05 * 19
    assert(got(20L) == 19.05) // 1 + 0.95 * 19
    assert(got(10L) == 10.0)  // interior values untouched
    assert(got(21L) == 1000.0)
  }

  test("targetEncode shrinks rare categories toward the global prior") {
    val df = Seq(("a", 10.0), ("a", 20.0), ("b", 100.0)).toDF("c", "v")
    val got = graft.ops.Features.targetEncode(df, "c", "v", alpha = 3.0)
      .collect().map(r => r.getString(0) -> r).toMap
    // prior = 130/3, so alpha * prior = 130: encoded_a = (30+130)/5 = 32,
    // encoded_b = (100+130)/4 = 57.5 — the singleton moves far toward the
    // prior while the 2-row category moves less
    assert(got("a").getDouble(2) == 15.0 && got("a").getDouble(3) == 32.0)
    assert(got("b").getLong(1) == 1L && got("b").getDouble(3) == 57.5)
  }

  test("targetEncodeCv: out-of-fold means exclude the row's own fold — " +
    "the outlier in fold X never contaminates (cat, X)'s encoding") {
    // replicate the md5 fold assignment independently
    def foldOf(id: Long, folds: Int): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(4)
      java.lang.Long.parseLong(hex, 16) % folds
    }
    val rows = (1L to 100L).map(id =>
      (id, s"c${id % 2}", if (id == 4L) 1000.0 else 1.0))
    val byCatFold = rows.groupBy { case (id, c, _) => (c, foldOf(id, 5)) }
      .view.mapValues(vs => (vs.size.toLong, vs.map(_._3).sum)).toMap
    val byCat = rows.groupBy(_._2)
      .view.mapValues(vs => (vs.size.toLong, vs.map(_._3).sum)).toMap
    val (bigN, bigS) = (rows.size.toLong, rows.map(_._3).sum)
    val byFold = rows.groupBy { case (id, _, _) => foldOf(id, 5) }
      .view.mapValues(vs => (vs.size.toLong, vs.map(_._3).sum)).toMap
    val df = rows.toDF("event_id", "event_type", "value")
    val got = graft.ops.Features
      .targetEncodeCv(df, "event_type", "value", "event_id")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got.size == byCatFold.size)
    val outlierFold = foldOf(4L, 5)
    got.foreach { case ((c, fd), (nOof, rawOof, encoded)) =>
      val (n, s) = byCat(c)
      val (nF, sF) = byCatFold((c, fd))
      val (nfT, sfT) = byFold(fd)
      assert(nOof == n - nF, s"($c,$fd) n_oof")
      assert(math.abs(rawOof - (s - sF) / (n - nF)) < 1e-6, s"($c,$fd) raw")
      val prior = (bigS - sfT) / (bigN - nfT)
      assert(math.abs(encoded -
        ((s - sF) + 20.0 * prior) / ((n - nF) + 20.0)) < 1e-6, s"($c,$fd)")
      // the outlier (id 4, cat c0) only inflates rows OUTSIDE its fold
      if (c == "c0" && fd == outlierFold)
        assert(rawOof < 2.0, "own-fold row must exclude the outlier")
      if (c == "c0" && fd != outlierFold)
        assert(rawOof > 10.0, "other folds see the outlier")
    }
  }

  test("curriculumOrder: round-robin interleave, within-source ranks by quality") {
    // two sources x two docs; "good" docs carry distinct tokens + stopwords
    val docs = Seq(
      (1L, "the quick brown fox jumps over a lazy dog today", "sA"),
      (2L, "x x x x x x x x x x", "sA"),
      (3L, "and every token of this sentence is distinct here", "sB"),
      (4L, "y y y y y y y y y y", "sB"))
      .toDF("doc_id", "text", "source")
    val got = graft.ops.TextAnalysis.curriculumOrder(docs)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) == (("sA", 1L, 0L)) && got(3L) == (("sB", 1L, 1L)),
      "both sources' best docs precede every rank-2 doc")
    assert(got(2L) == (("sA", 2L, 2L)) && got(4L) == (("sB", 2L, 3L)))
  }

  test("datasetCard: volume, composition, quality, and dup rate in one row") {
    val docs = Seq(
      (1L, "a b", "en", "s1"),
      (2L, "a b", "en", "s1"), // exact duplicate of doc 1
      (3L, "c d e f", "en", "s2")).toDF("doc_id", "text", "lang", "source")
    val r = graft.ops.TextAnalysis.datasetCard(docs).collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 8L)
    assert(r.getLong(2) == 2L && r.getLong(3) == 1L)
    // q("a b") = .04*.4 + .5*.3 + 1*.3 = .466; q("c d e f") = .032 + .3
    assert(r.getDouble(4) == 0.421333)
    assert(r.getDouble(5) == 2.0)
    assert(r.getDouble(6) == 0.333333, "one of three texts is a dup")
  }

  test("keywords: per-doc top-k by tf-idf with lexicographic tie-break") {
    // n_docs = 2: idf = ln(3/(df+1)) — df-2 tokens score 0, df-1 score ln(1.5)
    val docs = Seq(
      (1L, "rare rare common zeta"),
      (2L, "common common alpha beta")).toDF("doc_id", "text")
    val got = graft.ops.TextAnalysis.keywords(docs, k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(3)) -> r.getString(1)).toMap
    assert(got((1L, 1L)) == "rare" && got((1L, 2L)) == "zeta")
    assert(got((2L, 1L)) == "alpha" && got((2L, 2L)) == "beta",
      "equal scores fall back to token order")
    assert(got.size == 4)
  }

  test("cdfTable: running counts over distinct values, ties collapse to one row") {
    val df = Seq(("g", 1.0), ("g", 1.0), ("g", 2.0), ("g", 5.0), ("h", 9.0))
      .toDF("grp", "x")
    val got = graft.ops.Features.cdfTable(df, "grp", "x")
      .collect().map(r => (r.getString(0), r.getDouble(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got(("g", 1.0)) == ((2L, 2L, 0.5)), "tied values share one CDF row")
    assert(got(("g", 2.0)) == ((1L, 3L, 0.75)))
    assert(got(("g", 5.0)) == ((1L, 4L, 1.0)))
    assert(got(("h", 9.0)) == ((1L, 1L, 1.0)), "groups never mix")
  }

  test("woeBinning: perfectly separating feature gives symmetric signed woe") {
    // values 1..100, positive iff > 50, two bins at the median: bin 0 is
    // all-negative, bin 1 all-positive
    val df = (1 to 100).map(v => (v.toDouble, v > 50)).toDF("v", "pos")
    val got = graft.ops.Features.woeBinning(df, "v", "pos", nBins = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    val (p0, n0, w0) = got(0L)
    val (p1, n1, w1) = got(1L)
    assert(p0 == 0L && n0 == 50L && p1 == 50L && n1 == 0L)
    assert(w0 < 0 && w1 > 0 && w1 == -w0, "Laplace smoothing keeps woe finite and symmetric")
  }

  test("negativeSamples: draws follow the tempered unigram mass, deterministically") {
    val docs = Seq((1L, "z z z z z z z z a b")).toDF("doc_id", "text")
    val run1 = graft.ops.TextAnalysis.negativeSamples(docs, nDraws = 100)
      .collect().map(r => (r.getLong(0), r.getString(2))).sorted
    val run2 = graft.ops.TextAnalysis.negativeSamples(docs, nDraws = 100)
      .collect().map(r => (r.getLong(0), r.getString(2))).sorted
    assert(run1.length == 100, "every draw resolves to exactly one token")
    assert(run1.toSeq == run2.toSeq, "md5-derived draws are reproducible")
    val byTok = run1.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byTok.keySet.subsetOf(Set("a", "b", "z")))
    // z holds ~70% of the tempered mass (8^0.75 of 8^0.75 + 2)
    assert(byTok("z") > 50, s"dominant token under-drawn: $byTok")
  }

  test("tokenEntropy: uniform docs hit ln(k), repeats score 0") {
    val docs = Seq(
      (1L, "a b c d"),      // 4 distinct of 4 -> ln 4
      (2L, "a a a a"),      // 1 distinct      -> 0
      (3L, "a a b b")       // uniform over 2  -> ln 2
    ).toDF("doc_id", "text")
    val got = TextAnalysis.tokenEntropy(docs)
      .select("doc_id", "entropy").as[(Long, Double)].collect().toMap
    assert(got(1L) == math.rint(math.log(4) * 1e4) / 1e4)
    assert(got(2L) == 0.0)
    assert(got(3L) == math.rint(math.log(2) * 1e4) / 1e4)
  }

  test("langDrift: identical slices diverge 0, disjoint slices hit ln 2") {
    val same = (1L to 20L).map(i => (i, if (i % 2 == 0) "en" else "fr"))
      .toDF("doc_id", "lang")
    val jsdSame = TextAnalysis.langDrift(same,
      col("doc_id") % 2 === 0, col("doc_id") % 2 === 1)
      .as[Double].head()
    // even slice is all-en, odd all-fr -> maximal drift ln 2
    assert(jsdSame == math.rint(math.log(2) * 1e6) / 1e6)
    val mixed = (1L to 20L).map(i => (i, if (i <= 10) "en" else "fr"))
      .toDF("doc_id", "lang")
    // both slices are 50/50 en/fr -> zero drift
    val jsdZero = TextAnalysis.langDrift(mixed,
      col("doc_id") % 2 === 0, col("doc_id") % 2 === 1)
      .as[Double].head()
    assert(jsdZero == 0.0)
  }

  test("lmScore: MLE bigram log-probs, averaged per doc; sub-bigram docs absent") {
    val docs = Seq(
      (1L, "a b"),  // P(b|a) = 2/3
      (2L, "a c"),  // P(c|a) = 1/3
      (3L, "a b"),  // same as doc 1
      (4L, "z")     // no bigrams -> absent
    ).toDF("doc_id", "text")
    val got = TextAnalysis.lmScore(docs)
      .select("doc_id", "n_bigrams", "avg_logp")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got(1L) == ((1L, math.rint(math.log(2.0 / 3.0) * 1e4) / 1e4)))
    assert(got(2L) == ((1L, math.rint(math.log(1.0 / 3.0) * 1e4) / 1e4)))
    assert(got(1L) == got(3L))
    // the common pattern scores strictly higher than the rare one
    assert(got(1L)._2 > got(2L)._2)
  }

  test("lmScore averages over repeated bigrams within a doc") {
    val docs = Seq(
      (1L, "a b a b"),  // bigrams: (a b) x2, (b a) x1
      (2L, "a c")
    ).toDF("doc_id", "text")
    // corpus counts: c(a b)=2, c(b a)=1, c(a c)=1; prefixes: a=3, b=1
    val want = (2 * math.log(2.0 / 3.0) + math.log(1.0 / 1.0)) / 3.0
    val got = TextAnalysis.lmScore(docs)
      .filter(col("doc_id") === 1L)
      .select("n_bigrams", "avg_logp").as[(Long, Double)].head()
    assert(got._1 == 3L)
    assert(math.abs(got._2 - want) < 1e-4)
  }

  test("chunkDocuments: overlap, short tails, and sub-window docs") {
    val docs = Seq(
      (1L, (1 to 80).map(i => s"w$i").mkString(" ")), // 80 tokens: 4 chunks
      (2L, "a b c") // 3 tokens: one short chunk
    ).toDF("doc_id", "text")
    val got = TextAnalysis.chunkDocuments(docs, chunkSize = 32, stride = 24)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val d1 = got.filter(_._1 == 1L).sortBy(_._2)
    // starts 0, 24, 48, 72 -> lengths 32, 32, 32, 8
    assert(d1.map(_._3).toSeq == Seq(32L, 32L, 32L, 8L))
    // consecutive chunks overlap by chunkSize - stride = 8 tokens
    assert(d1(0)._4.split(" ").takeRight(8).toSeq ==
      d1(1)._4.split(" ").take(8).toSeq)
    assert(d1(3)._4 == (73 to 80).map(i => s"w$i").mkString(" "))
    // a doc shorter than one window yields exactly one whole-doc chunk
    assert(got.filter(_._1 == 2L).toSeq == Seq((2L, 0L, 3L, "a b c")))
  }

  test("bm25 ranks by query-term density, is length-normalized, drops no-hit docs") {
    val docs = Seq(
      (1L, "spark spark spark"), // dense in the query term, short
      (2L, "spark noise noise noise noise noise noise noise"), // one hit, long
      (3L, "noise only noise"), // no hits: must be absent
      (4L, "spark spark noise")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.bm25(docs, Seq("spark"), topK = 10)
      .select("doc_id", "bm25").as[(Long, Double)].collect()
    assert(got.map(_._1).toSeq == Seq(1L, 4L, 2L),
      "short all-hit doc first, long single-hit doc last, no-hit doc absent")
    // hand-check doc 2: tf=1, df=3, n=4, dl=8, avgdl=(3+8+3+3)/4
    val idf = math.log((4 - 3 + 0.5) / (3 + 0.5) + 1.0)
    val want = idf * 1 * 2.2 / (1 + 1.2 * (0.25 + 0.75 * 8.0 / 4.25))
    val d2 = got.find(_._1 == 2L).get._2
    assert(math.abs(d2 - want) < 1e-4, s"got $d2, want $want")
  }

  test("calibrationTable: equal-width bins, score 1.0 folds into the top bin") {
    val scored = Seq(
      (0.05, 1.0), (0.05, 0.0), // bin 0, frac_pos .5
      (0.55, 0.0),              // bin 5
      (0.95, 1.0), (1.00, 1.0)  // bin 9 (1.0 folds down), frac_pos 1
    ).toDF("s", "y")
    val got = graft.ops.Features.calibrationTable(scored, "s", "y")
      .select("bin", "n", "mean_score", "frac_pos")
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (0L, 2L, 0.05, 0.5), (5L, 1L, 0.55, 0.0), (9L, 2L, 0.975, 1.0)))
  }

  test("psi: identical slices land every bin at equal shares and zero terms") {
    // ref and cur are both 1..100: ref-quantile bins hold 10 ref and 10 cur
    // values each, so every psi_term is exactly 0
    val df = ((1 to 100).map(v => (v.toDouble, true))
      ++ (1 to 100).map(v => (v.toDouble, false))).toDF("v", "r")
    val got = graft.ops.Features.psi(df, "v", "r")
      .select("bin", "n_ref", "n_cur", "ref_share", "cur_share", "psi_term")
      .as[(Int, Long, Long, Double, Double, Double)].collect().sortBy(_._1)
    assert(got.length == 10)
    assert(got.forall { case (_, nr, nc, rs, cs, t) =>
      nr == 10L && nc == 10L && rs == 0.1 && cs == 0.1 && t == 0.0 })
  }

  test("psi: a hard shift concentrates current mass and raises total PSI") {
    // current slice sits entirely above the reference's top decile edge
    val df = ((1 to 100).map(v => (v.toDouble, true))
      ++ (201 to 300).map(v => (v.toDouble, false))).toDF("v", "r")
    val rows = graft.ops.Features.psi(df, "v", "r")
      .select("bin", "n_cur", "psi_term")
      .as[(Int, Long, Double)].collect()
    // all 100 current values fall past every edge -> bin 9
    assert(rows.filter(_._1 == 9).map(_._2).sum == 100L)
    val total = rows.map(_._3).sum
    assert(total > 0.25, s"shift must trip the action threshold, got $total")
  }

  test("vocabGrowth: hand corpus — early deciles see only doc 0, the " +
    "last decile sees everything") {
    // max_doc = 1: thresholds (1*d) div 10 = 0 for d in 1..9, 1 at d=10
    val docs = Seq((0L, "a b"), (1L, "a c")).toDF("doc_id", "text")
    val rows = graft.ops.TextAnalysis.vocabGrowth(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(rows.length == 10)
    rows.filter(_._1 < 10).foreach { case (_, nDocs, nTok, vocab, ttr) =>
      assert(nDocs == 1L && nTok == 2L && vocab == 2L && ttr == 1.0)
    }
    val last = rows.find(_._1 == 10L).get
    assert(last == ((10L, 2L, 4L, 3L, 0.75)))
  }
  test("collocations: lift ranks attraction, ties break on the pair text") {
    // "x y x y x z": xy lift 10/6, yx lift 2.5, xz lift 5/3 — yx first,
    // then the exact 1.666667 tie broken x-then-y lexicographically
    val docs = Seq((1L, "x y x y x z")).toDF("doc_id", "text")
    val got = graft.ops.TextAnalysis.collocations(docs, minCount = 1)
      .as[(String, String, Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      ("y", "x", 2L, 2L, 2L, 2.5),
      ("x", "y", 2L, 3L, 2L, 1.666667),
      ("x", "z", 1L, 3L, 1L, 1.666667)))
  }
}
