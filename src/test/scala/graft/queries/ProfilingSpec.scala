package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariant + brute-force cross-checks for the Profiling pack
  * (q98_profile, q99_changepoint, q100_decile_lift). The DuckDB
  * oracles pin exact values; these specs pin the internal consistency
  * a hash-match alone wouldn't explain, plus a from-scratch Scala
  * recomputation of the changepoint statistic.
  */
class ProfilingSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private def run(name: String) =
    SparkEntry.queries(name)(spark, dir).collect()

  test("q98: one row per profiled column, counts consistent") {
    val rows = run("q98_profile")
    assert(rows.length == 11, s"expected 11 profiled columns, got " +
      s"${rows.length}")
    val nRows = rows.head.getAs[Long]("n_rows")
    assert(nRows > 0)
    rows.foreach { r =>
      val name = r.getAs[String]("col_name")
      assert(r.getAs[Long]("n_rows") == nRows, s"row-count drift: $r")
      val nulls = r.getAs[Long]("n_nulls")
      val nd = r.getAs[Long]("n_distinct")
      assert(nulls >= 0 && nulls <= nRows, s"null count range: $r")
      assert(nd >= 1 && nd <= nRows - nulls, s"distinct range: $r")
      val hasNum = !r.isNullAt(r.fieldIndex("min_num"))
      val hasStr = !r.isNullAt(r.fieldIndex("min_str"))
      assert(hasNum ^ hasStr, s"exactly one repr must be present: $r")
      if (hasNum) {
        val mn = r.getAs[Double]("min_num")
        val mx = r.getAs[Double]("max_num")
        assert(mn <= mx, s"min > max: $r")
        if (!r.isNullAt(r.fieldIndex("mean"))) {
          val mean = r.getAs[Double]("mean")
          assert(mean >= mn && mean <= mx, s"mean outside [min,max]: $r")
        } else assert(name == "l_shipdate",
          s"only the timestamp row may omit mean: $r")
      } else {
        assert(r.getAs[String]("min_str") <= r.getAs[String]("max_str"),
          s"string min > max: $r")
      }
    }
    // spot-check one distinct count against a direct computation
    val flagRow = rows.find(_.getAs[String]("col_name") == "l_returnflag").get
    val direct = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_returnflag").distinct().count()
    assert(flagRow.getAs[Long]("n_distinct") == direct)
  }

  test("q99: matches a from-scratch per-user CUSUM recomputation") {
    val rows = run("q99_changepoint")
    assert(rows.nonEmpty)
    // brute force: argmax_t |n*C_t - t*T| per user, earliest tiebreak
    // the fixture's ts is TIMESTAMP_NTZ → external LocalDateTime;
    // epoch micros carry the full precision for ordering
    def micros(t: java.time.LocalDateTime): Long =
      t.toInstant(java.time.ZoneOffset.UTC).getEpochSecond * 1000000L +
        t.getNano / 1000L
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .selectExpr("user_id", "ts", "event_id",
        "CAST(round(value * 100) AS BIGINT) AS cents")
      .collect()
      .map(r => (r.getAs[Long]("user_id"),
        r.getAs[java.time.LocalDateTime]("ts"), r.getAs[Long]("event_id"),
        r.getAs[Long]("cents")))
    val expected = ev.groupBy(_._1).map { case (u, rs) =>
      val sorted = rs.sortBy(r => (micros(r._2), r._3))
      val n = sorted.length
      val tot = sorted.map(_._4).sum
      var c = 0L
      val scored = sorted.zipWithIndex.map { case (r, i) =>
        c += r._4
        val score = (BigInt(n) * BigInt(c) - BigInt(i + 1) * BigInt(tot)).abs
        (r._2, r._3, score)
      }
      val best = scored.minBy(s => (-s._3, (micros(s._1), s._2)))
      // the query's exact-integer HALF_UP semantics (floor((2p+q)/(2q))
      // == round-half-up(p/q)) — NOT double-division-then-round, whose
      // shortest-repr tie handling is the pre-fix behavior the query
      // abandoned after the sf1 rounding-tie finding
      val q = BigInt(n) * 100
      val shift4 = (best._3 * 2 * 10000 + q) / (q * 2)
      val shift = shift4.toDouble / 10000.0
      (u, (n.toLong, best._1, shift))
    }
    assert(rows.length == expected.size)
    rows.foreach { r =>
      val u = r.getAs[Long]("user_id")
      val (n, ts, shift) = expected(u)
      assert(r.getAs[Long]("n_events") == n, s"n_events mismatch u=$u")
      assert(r.getAs[java.time.LocalDateTime]("change_ts") == ts,
        s"change_ts mismatch u=$u: got " +
          s"${r.getAs[java.time.LocalDateTime]("change_ts")}, want $ts")
      assert(math.abs(r.getAs[Double]("max_shift") - shift) < 1e-9,
        s"max_shift mismatch u=$u: got " +
          s"${r.getAs[Double]("max_shift")}, want $shift")
    }
  }

  test("q100: decile partition covers the corpus; capture/lift algebra") {
    val rows = run("q100_decile_lift").sortBy(_.getAs[Long]("decile"))
    assert(rows.map(_.getAs[Long]("decile")).toSeq == (1L to 10L),
      "expected exactly deciles 1..10")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val total = docs.count()
    val pos = docs.filter("lang = 'en'").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == total)
    assert(rows.map(_.getAs[Long]("n_pos")).sum == pos)
    // SQL ntile: first (total mod 10) deciles get one extra row
    val base = total / 10; val rem = (total % 10).toInt
    rows.foreach { r =>
      val want = if (r.getAs[Long]("decile") <= rem) base + 1 else base
      assert(r.getAs[Long]("n_docs") == want, s"ntile sizing: $r")
    }
    val baseRate = pos.toDouble / total
    rows.foreach { r =>
      val rate = r.getAs[Double]("pos_rate")
      val lift = r.getAs[Double]("lift")
      assert(math.abs(lift - rate / baseRate) < 1e-3,
        s"lift inconsistent with pos_rate/base: $r")
    }
    assert(math.abs(rows.last.getAs[Double]("cum_capture") - 1.0) < 1e-9,
      "final cumulative capture must be 1.0")
  }

  test("q104: one PSI row per source, each non-negative (every " +
    "(p-q)ln(p/q) term has matching signs), doc counts tile the corpus") {
    val rows = run("q104_psi")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .filter("n_chars IS NOT NULL")
    assert(rows.length ==
      docs.select("source").distinct().count().toInt,
      "every source must get a PSI row")
    rows.foreach { r =>
      // sign(p-q) = sign(ln(p/q)), so every included bucket term is
      // >= 0 and so is the sum (up to the DECIMAL(20,10) cast, which
      // can shave at most 1e-10 per bucket below zero)
      assert(r.getAs[Double]("psi") >= -1e-9, s"negative PSI: $r")
      assert(r.getAs[Long]("n_docs") > 0)
    }
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs.count(),
      "per-source doc counts must tile the corpus")
  }

  test("q105: AUC equals brute-force pairwise concordance " +
    "(ties at half weight) and gini = 2*auc - 1") {
    val r = run("q105_auc").head
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("n_chars AS score",
        "CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS BIGINT) AS pos")
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    val posS = docs.filter(_._2 == 1L).map(_._1)
    val negS = docs.filter(_._2 == 0L).map(_._1)
    assert(r.getAs[Long]("n_pos") == posS.length.toLong)
    assert(r.getAs[Long]("n_neg") == negS.length.toLong)
    var num = 0.0 // concordant + half-weight ties, the AUC definition
    for (p <- posS; n <- negS)
      num += (if (p > n) 1.0 else if (p == n) 0.5 else 0.0)
    val want = num / (posS.length.toDouble * negS.length)
    assert(math.abs(r.getAs[Double]("auc") - want) < 1e-6,
      s"AUC ${r.getAs[Double]("auc")} != brute $want")
    assert(math.abs(r.getAs[Double]("gini") -
      (2 * r.getAs[Double]("auc") - 1)) < 2e-6, s"gini algebra: $r")
  }

  test("q106: Kaplan-Meier curve matches a from-scratch product-form " +
    "recomputation; survival is monotone non-increasing") {
    val rows = SparkEntry.queries("q106_survival")(spark, dir).collect()
    assert(rows.nonEmpty)
    // brute force: per-user lifetimes in full hours + 24h churn flag
    def micros(t: java.time.LocalDateTime): Long =
      t.toInstant(java.time.ZoneOffset.UTC).getEpochSecond * 1000000L +
        t.getNano / 1000L
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .selectExpr("user_id",
        "CAST(ts AS TIMESTAMP_NTZ) AS ts").collect()
      .map(r => (r.getAs[Long]("user_id"),
        micros(r.getAs[java.time.LocalDateTime]("ts"))))
    val mx = ev.map(_._2).max
    val lives = ev.groupBy(_._1).values.map { es =>
      val (a, b) = (es.map(_._2).min, es.map(_._2).max)
      ((b - a) / 3600000000L, if (mx - b > 86400000000L) 1 else 0)
    }.toSeq
    var atRisk = lives.size.toLong
    var surv = 1.0
    val want = lives.groupBy(_._1).toSeq.sortBy(_._1).flatMap {
      case (dur, ls) =>
        val d = ls.count(_._2 == 1).toLong
        val row = if (d > 0) {
          surv *= (1.0 - d.toDouble / atRisk)
          Some((dur, atRisk, d))
        } else None
        atRisk -= ls.size
        row
    }
    assert(rows.length == want.length)
    rows.zip(want).foreach { case (r, (dur, n, d)) =>
      assert(r.getLong(0) == dur && r.getLong(1) == n &&
        r.getLong(2) == d, s"KM step mismatch: $r vs ($dur,$n,$d)")
    }
    val survs = rows.map(_.getDouble(3)).toSeq
    assert(survs == survs.sorted.reverse,
      "survival must be monotone non-increasing")
    assert(survs.head <= 1.0 && survs.last >= 0.0)
    // survival values match the product form to rounding precision
    // (the engine sums DECIMAL-cast logs; product vs exp-sum agree
    // well within the 1e-6 output rounding on these magnitudes)
    var s2 = 1.0
    rows.foreach { r =>
      s2 *= (1.0 - r.getLong(2).toDouble / r.getLong(1))
      assert(math.abs(r.getDouble(3) - s2) < 1e-5,
        s"survival drifted from the product form: $r vs $s2")
    }
  }

  test("q109: class censuses match a from-scratch quasi-identifier " +
    "grouping of the collected customer rows") {
    import org.apache.spark.sql.functions._
    val rows = run("q109_k_anonymity")
    assert(rows.map(_.getLong(0)).toSeq == Seq(2L, 5L, 10L))
    val cust = graft.Tables(spark, dir, "customer")
      .select(col("c_nationkey"), col("c_mktsegment"), col("c_acctbal"))
      .collect()
    val classes = cust.groupBy(r => (r.getInt(0), r.getString(1),
      math.floor(r.getDouble(2) / 1000).toLong)).map(_._2.size.toLong)
    val total = cust.length.toLong
    for (r <- rows) {
      val th = r.getLong(0)
      val below = classes.filter(_ < th)
      assert(r.getLong(1) == below.size.toLong, s"k<$th n_classes")
      assert(r.getLong(2) == below.sum, s"k<$th n_rows")
      val want = math.floor((2.0 * below.sum * 1e6 + total) /
        (2.0 * total)) / 1e6
      assert(r.getDouble(3) == want, s"k<$th pct")
      // thresholds are nested: counts must be monotone in k
    }
    val counts = rows.map(_.getLong(2))
    assert(counts.zip(counts.tail).forall { case (a, b) => a <= b },
      "n_rows_below must be monotone in k_threshold")
  }
}
