package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Randomized differential testing over the TPC-H-ish schema
  * (VERDICT r5 #5): the 100 fixed oracle queries are green, so the
  * remaining correctness risk is the UNTESTED input space. Each seed
  * generates a random query — predicates, group keys, aggregates,
  * join type, join order — and builds it TWICE through independent
  * front-ends: once compositionally with the DataFrame API (Column
  * operators, never `expr(...)`) and once as an ANSI SQL string
  * through `spark.sql` over temp views. The two go through different
  * parsing/analysis paths; results must match row-for-row.
  *
  * The SQL strings are deliberately DuckDB-compatible (plain ANSI,
  * decimal-cast aggregates, EXISTS/NOT EXISTS for semi/anti), so any
  * failing seed's query can be replayed against the external oracle
  * with tools/check.py's machinery. Aggregates follow the Canon
  * discipline — sums/avgs over DECIMAL casts — so both paths are
  * exact and order-independent (a double sum would differ in ulps
  * between physical plans and flag phantom diffs).
  *
  * 300 seeds across 10 axes (≥ the verdict's 100-comparison bar; the
  * pool grew axis by axis as rounds added shapes); failures print the
  * seed and the full SQL for replay.
  */
class RandomDifferentialSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private val tableNames =
    Seq("lineitem", "orders", "customer", "part", "supplier", "nation")

  // builders resolve tables through this hook so the partitioning
  // axis below can re-run a seed's DataFrame formulation over
  // differently-partitioned inputs without touching the SQL path
  @volatile private var frameOverride: Map[String, DataFrame] = Map.empty
  private def tbl(n: String): DataFrame =
    frameOverride.getOrElse(n, frames(n))

  private lazy val frames: Map[String, DataFrame] = tableNames.map { n =>
    val df = spark.read.parquet(s"$dir/$n.parquet")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    df.createOrReplaceTempView(s"fuzz_$n")
    n -> df
  }.toMap

  // the shared session outlives this suite: drop the cached fixture
  // frames so the cache manager can't substitute InMemoryRelation
  // into OTHER suites' plans (q01's pushed-filter pin reads the same
  // parquet paths)
  override def afterAll(): Unit = {
    frames.values.foreach(_.unpersist())
    tableNames.foreach(n => spark.catalog.dropTempView(s"fuzz_$n"))
    super.afterAll()
  }

  // ---- schema metadata the generator draws from ----------------------
  private case class TblMeta(numeric: Seq[String], cats: Seq[String],
    dates: Seq[String])
  private val meta = Map(
    "lineitem" -> TblMeta(
      Seq("l_quantity", "l_extendedprice", "l_discount"),
      Seq("l_returnflag", "l_linestatus"), Seq("l_shipdate")),
    "orders" -> TblMeta(Seq("o_totalprice"),
      Seq("o_orderstatus", "o_orderpriority"), Seq("o_orderdate")),
    "customer" -> TblMeta(Seq("c_acctbal"), Seq("c_mktsegment"), Nil),
    "part" -> TblMeta(Seq("p_retailprice", "p_size"), Seq("p_brand"), Nil),
    "supplier" -> TblMeta(Seq("s_acctbal"), Nil, Nil),
    "nation" -> TblMeta(Nil, Seq("n_name"), Nil))

  // data-driven constants: numeric ranges and categorical domains are
  // sampled from the fixture once, so predicates are never vacuous
  private lazy val numRange: Map[(String, String), (Double, Double)] =
    (for {
      (t, m) <- meta.toSeq; c <- m.numeric
    } yield {
      val r = frames(t).agg(min(col(c).cast("double")),
        max(col(c).cast("double"))).collect()(0)
      (t, c) -> (r.getDouble(0), r.getDouble(1))
    }).toMap
  private lazy val catDomain: Map[(String, String), Seq[String]] =
    (for {
      (t, m) <- meta.toSeq; c <- m.cats
    } yield (t, c) -> frames(t).select(col(c)).distinct()
      .collect().map(_.getString(0)).sorted.take(25).toSeq).toMap
  private lazy val dateRange: Map[(String, String), (String, String)] =
    (for {
      (t, m) <- meta.toSeq; c <- m.dates
    } yield {
      val r = frames(t)
        .agg(min(col(c).cast("date")), max(col(c).cast("date")))
        .collect()(0)
      (t, c) -> (r.getDate(0).toString, r.getDate(1).toString)
    }).toMap

  // ---- predicates: (SQL fragment, independently-built Column) --------
  private def numPred(t: String): Gen[(String, Column)] = for {
    c <- Gen.oneOf(meta(t).numeric)
    op <- Gen.oneOf("<", "<=", ">", ">=")
    f <- Gen.choose(0.05, 0.95)
  } yield {
    val (lo, hi) = numRange((t, c))
    val v = BigDecimal(lo + f * (hi - lo))
      .setScale(2, BigDecimal.RoundingMode.HALF_UP)
    val cc = op match {
      case "<" => col(c) < v.toDouble
      case "<=" => col(c) <= v.toDouble
      case ">" => col(c) > v.toDouble
      case ">=" => col(c) >= v.toDouble
    }
    (s"$c $op $v", cc)
  }

  private def catPred(t: String): Gen[(String, Column)] = for {
    c <- Gen.oneOf(meta(t).cats)
    dom = catDomain((t, c))
    k <- Gen.choose(1, math.min(3, dom.size))
    vs <- Gen.pick(k, dom)
  } yield {
    val sorted = vs.toSeq.sorted
    val sql =
      if (sorted.size == 1) s"$c = '${sorted.head}'"
      else s"$c IN (${sorted.map(v => s"'$v'").mkString(", ")})"
    val cc =
      if (sorted.size == 1) col(c) === sorted.head
      else col(c).isin(sorted: _*)
    (sql, cc)
  }

  private def datePred(t: String): Gen[(String, Column)] = for {
    c <- Gen.oneOf(meta(t).dates)
    op <- Gen.oneOf("<=", ">=")
    f <- Gen.choose(0.1, 0.9)
  } yield {
    val (lo, hi) = dateRange((t, c))
    val loD = java.time.LocalDate.parse(lo)
    val span = java.time.temporal.ChronoUnit.DAYS
      .between(loD, java.time.LocalDate.parse(hi))
    val d = loD.plusDays((span * f).toLong).toString
    val cc =
      if (op == "<=") col(c).cast("date") <= to_date(lit(d))
      else col(c).cast("date") >= to_date(lit(d))
    (s"CAST($c AS DATE) $op DATE '$d'", cc)
  }

  private def predGen(t: String): Gen[(String, Column)] = {
    val m = meta(t)
    val gens = Seq(
      if (m.numeric.nonEmpty) Some(numPred(t)) else None,
      if (m.cats.nonEmpty) Some(catPred(t)) else None,
      if (m.dates.nonEmpty) Some(datePred(t)) else None).flatten
    Gen.oneOf(gens.head, gens.tail.headOption.getOrElse(gens.head),
      gens.drop(2): _*)
  }

  private def predsGen(t: String, max: Int): Gen[Seq[(String, Column)]] =
    for {
      n <- Gen.choose(0, max)
      ps <- Gen.listOfN(n, predGen(t))
    } yield ps

  // ---- aggregates (Canon discipline: decimal casts, exact) -----------
  private def aggGen(numCols: Seq[String]): Gen[Seq[(String, Column)]] =
    for {
      n <- Gen.choose(0, math.min(2, numCols.size))
      cols0 <- Gen.pick(n, numCols)
      fns <- Gen.listOfN(n, Gen.oneOf("sum", "avg", "min", "max"))
    } yield cols0.toSeq.zip(fns).zipWithIndex.map { case ((c, fn), i) =>
      val alias = s"a$i"
      fn match {
        case "sum" =>
          (s"sum(CAST($c AS DECIMAL(18,2))) AS $alias",
            sum(col(c).cast(DecimalType(18, 2))).as(alias))
        case "avg" =>
          (s"avg(CAST($c AS DECIMAL(18,2))) AS $alias",
            avg(col(c).cast(DecimalType(18, 2))).as(alias))
        case "min" =>
          (s"min(CAST($c AS DECIMAL(18,2))) AS $alias",
            min(col(c).cast(DecimalType(18, 2))).as(alias))
        case "max" =>
          (s"max(CAST($c AS DECIMAL(18,2))) AS $alias",
            max(col(c).cast(DecimalType(18, 2))).as(alias))
      }
    }

  // ---- query shapes ---------------------------------------------------
  private case class TestQuery(label: String, sql: String,
    df: () => DataFrame)

  /** Aggregation tail shared by every shape: group keys + count(*) +
    * decimal aggregates, ordered by every output column. */
  private def withTail(label: String, fromSql: String,
      baseDf: () => DataFrame, groupPool: Seq[String],
      numPool: Seq[String], whereSql: Seq[String],
      whereCols: Seq[Column]): Gen[TestQuery] = for {
    nk <- Gen.choose(0, math.min(2, groupPool.size))
    keys0 <- Gen.pick(nk, groupPool)
    aggs <- aggGen(numPool)
    limited <- Gen.oneOf(true, false)
    havingAt <- Gen.frequency((2, 0), (1, 2), (1, 5))
  } yield {
    val keys = keys0.toSeq.sorted
    val where =
      if (whereSql.isEmpty) "" else s" WHERE ${whereSql.mkString(" AND ")}"
    val selectItems =
      keys ++ Seq("CAST(count(*) AS BIGINT) AS cnt") ++ aggs.map(_._1)
    val groupBy =
      if (keys.isEmpty) "" else s" GROUP BY ${keys.mkString(", ")}"
    val having =
      if (keys.isEmpty || havingAt == 0) ""
      else s" HAVING count(*) >= $havingAt"
    val outCols = keys ++ Seq("cnt") ++ aggs.zipWithIndex.map {
      case (_, i) => s"a$i"
    }
    val orderBy = s" ORDER BY ${outCols.mkString(", ")}"
    val lim = if (limited) " LIMIT 20" else ""
    val sql = s"SELECT ${selectItems.mkString(", ")} FROM $fromSql" +
      where + groupBy + having + orderBy + lim
    val build = () => {
      var d = baseDf()
      whereCols.foreach(c => d = d.filter(c))
      val aggCols = (count(lit(1)).cast("long").as("cnt") +:
        aggs.map(_._2)).toList
      var out =
        if (keys.isEmpty) d.agg(aggCols.head, aggCols.tail: _*)
        else d.groupBy(keys.map(col): _*)
          .agg(aggCols.head, aggCols.tail: _*)
      if (keys.nonEmpty && havingAt > 0)
        out = out.filter(col("cnt") >= havingAt)
      out = out.orderBy(outCols.map(col): _*)
      if (limited) out.limit(20) else out
    }
    TestQuery(label, sql, build)
  }

  private def singleGen: Gen[TestQuery] = for {
    t <- Gen.oneOf("lineitem", "orders", "customer", "part")
    ps <- predsGen(t, 2)
    q <- withTail(s"single:$t", s"fuzz_$t", () => tbl(t),
      meta(t).cats, meta(t).numeric, ps.map(_._1), ps.map(_._2))
  } yield q

  private val joinPairs = Seq(
    ("orders", "customer", "o_custkey", "c_custkey"),
    ("lineitem", "orders", "l_orderkey", "o_orderkey"),
    ("lineitem", "part", "l_partkey", "p_partkey"),
    ("lineitem", "supplier", "l_suppkey", "s_suppkey"),
    ("customer", "nation", "c_nationkey", "n_nationkey"),
    ("supplier", "nation", "s_nationkey", "n_nationkey"))

  private def join2Gen: Gen[TestQuery] = for {
    (l, r, lk, rk) <- Gen.oneOf(joinPairs)
    jt <- Gen.oneOf("inner", "left_outer", "left_semi", "left_anti")
    lps <- predsGen(l, 1)
    rps <- predsGen(r, 1)
    q <- {
      val semiAnti = jt == "left_semi" || jt == "left_anti"
      val (fromSql, whereSql, whereCols, buildBase) =
        if (semiAnti) {
          val ex = if (jt == "left_semi") "EXISTS" else "NOT EXISTS"
          val rWhere = (s"$rk = $lk" +: rps.map(_._1)).mkString(" AND ")
          (s"fuzz_$l",
            lps.map(_._1) :+ s"$ex (SELECT 1 FROM fuzz_$r WHERE $rWhere)",
            lps.map(_._2),
            () => {
              var rr = tbl(r)
              rps.foreach { case (_, c) => rr = rr.filter(c) }
              tbl(l).join(rr, col(lk) === col(rk), jt)
            })
        } else {
          val kw = if (jt == "inner") "JOIN" else "LEFT JOIN"
          (s"fuzz_$l $kw fuzz_$r ON $lk = $rk",
            lps.map(_._1) ++ rps.map(_._1),
            lps.map(_._2) ++ rps.map(_._2),
            () => tbl(l).join(tbl(r), col(lk) === col(rk), jt))
        }
      val groupPool =
        if (semiAnti) meta(l).cats else meta(l).cats ++ meta(r).cats
      val numPool =
        if (semiAnti) meta(l).numeric else meta(l).numeric ++ meta(r).numeric
      withTail(s"join2:$l-$r:$jt", fromSql, buildBase, groupPool,
        numPool, whereSql, whereCols)
    }
  } yield q

  /** 3-table chain with a RANDOM DataFrame join order — Catalyst must
    * produce identical results for (l⋈o)⋈c and l⋈(o⋈c). */
  private def join3Gen: Gen[TestQuery] = for {
    leftFirst <- Gen.oneOf(true, false)
    lps <- predsGen("lineitem", 1)
    ops <- predsGen("orders", 1)
    q <- withTail(s"join3:${if (leftFirst) "lo-c" else "l-oc"}",
      "fuzz_lineitem JOIN fuzz_orders ON l_orderkey = o_orderkey " +
        "JOIN fuzz_customer ON o_custkey = c_custkey",
      () => {
        if (leftFirst)
          tbl("lineitem")
            .join(tbl("orders"), col("l_orderkey") === col("o_orderkey"))
            .join(tbl("customer"), col("o_custkey") === col("c_custkey"))
        else
          tbl("lineitem").join(
            tbl("orders").join(tbl("customer"),
              col("o_custkey") === col("c_custkey")),
            col("l_orderkey") === col("o_orderkey"))
      },
      meta("lineitem").cats ++ meta("orders").cats ++
        meta("customer").cats,
      meta("lineitem").numeric ++ meta("orders").numeric,
      lps.map(_._1) ++ ops.map(_._1),
      lps.map(_._2) ++ ops.map(_._2))
  } yield q

  /** Window functions: rank/row_number/dense_rank (and a top-K filter
    * over them) with a total order inside each partition — the unique
    * key rides the ORDER BY so every rank is deterministic. */
  private val windowTables = Seq(
    ("customer", "c_mktsegment", "c_acctbal", Seq("c_custkey")),
    ("orders", "o_orderstatus", "o_totalprice", Seq("o_orderkey")),
    ("lineitem", "l_returnflag", "l_extendedprice",
      Seq("l_orderkey", "l_linenumber")))

  private def windowGen: Gen[TestQuery] = for {
    (t, part, ord, uniq) <- Gen.oneOf(windowTables)
    fn <- Gen.oneOf("row_number", "rank", "dense_rank")
    desc <- Gen.oneOf(true, false)
    topK <- Gen.choose(2, 5)
    ps <- predsGen(t, 1)
  } yield {
    val dir0 = if (desc) "DESC" else "ASC"
    val orderSql = (s"$ord $dir0" +: uniq).mkString(", ")
    val where =
      if (ps.isEmpty) "" else s" WHERE ${ps.map(_._1).mkString(" AND ")}"
    val outCols = Seq(part, ord) ++ uniq ++ Seq("rk")
    val sql =
      s"SELECT ${outCols.mkString(", ")} FROM (" +
        s"SELECT $part, $ord, ${uniq.mkString(", ")}, " +
        s"CAST($fn() OVER (PARTITION BY $part ORDER BY $orderSql) " +
        s"AS BIGINT) AS rk FROM fuzz_$t$where) " +
        s"WHERE rk <= $topK ORDER BY ${outCols.mkString(", ")}"
    val build = () => {
      import org.apache.spark.sql.expressions.Window
      var d = tbl(t)
      ps.foreach { case (_, c) => d = d.filter(c) }
      val ordCols = (if (desc) col(ord).desc else col(ord).asc) +:
        uniq.map(col)
      val w = Window.partitionBy(col(part)).orderBy(ordCols: _*)
      val f = fn match {
        case "row_number" => row_number()
        case "rank" => rank()
        case "dense_rank" => dense_rank()
      }
      d.select((Seq(part, ord) ++ uniq).map(col) :+
          f.over(w).cast("long").as("rk"): _*)
        .filter(col("rk") <= topK)
        .orderBy(outCols.map(col): _*)
    }
    TestQuery(s"window:$t:$fn", sql, build)
  }

  // ---- set operations: two predicate selections over one table ------
  // UNION/UNION ALL/INTERSECT/EXCEPT each have their own dedup rules;
  // the axis checks the DataFrame methods (union/distinct, intersect,
  // except — Spark's are the DISTINCT forms, matching the SQL
  // defaults) against the SQL operators on categorical projections,
  // folded through the usual count tail so row multiplicities are
  // observable.
  private def setOpGen: Gen[TestQuery] = for {
    t <- Gen.oneOf("lineitem", "orders", "customer", "part")
    psA <- predsGen(t, 2)
    psB <- predsGen(t, 2)
    op <- Gen.oneOf("UNION ALL", "UNION", "INTERSECT", "EXCEPT")
    nc <- Gen.choose(1, math.min(2, meta(t).cats.size))
    cols0 <- Gen.pick(nc, meta(t).cats)
  } yield {
    val cols = cols0.toSeq.sorted
    val sel = cols.mkString(", ")
    def whereOf(ps: Seq[(String, Column)]) =
      if (ps.isEmpty) "" else s" WHERE ${ps.map(_._1).mkString(" AND ")}"
    val sql = s"SELECT $sel, CAST(count(*) AS BIGINT) AS cnt FROM (" +
      s"SELECT $sel FROM fuzz_$t${whereOf(psA)} $op " +
      s"SELECT $sel FROM fuzz_$t${whereOf(psB)}) u " +
      s"GROUP BY $sel ORDER BY ${(cols :+ "cnt").mkString(", ")}"
    val build = () => {
      def side(ps: Seq[(String, Column)]) = {
        var d = tbl(t)
        ps.foreach(p => d = d.filter(p._2))
        d.select(cols.map(col): _*)
      }
      val combined = op match {
        case "UNION ALL" => side(psA).union(side(psB))
        case "UNION" => side(psA).union(side(psB)).distinct()
        case "INTERSECT" => side(psA).intersect(side(psB))
        case "EXCEPT" => side(psA).except(side(psB))
      }
      combined.groupBy(cols.map(col): _*)
        .agg(count(lit(1)).cast("long").as("cnt"))
        .orderBy((cols :+ "cnt").map(col): _*)
    }
    TestQuery(s"setop:$op:$t", sql, build)
  }

  // ---- null semantics: the fixture is null-free, so DERIVE nulls ----
  // A projection nulls out one categorical value (nullif) and one
  // numeric range (CASE → NULL), then the standard aggregation tail
  // runs over it — exercising null group keys (grouped together,
  // ordered nulls-first by both Spark front-ends), aggregates skipping
  // nulls (count(*) vs sum/avg/min/max), and HAVING over null groups.
  // The SQL stays DuckDB-replayable except ORDER BY null placement
  // (DuckDB defaults NULLS LAST; add NULLS FIRST when replaying).
  private def nullSingleGen: Gen[TestQuery] = for {
    t <- Gen.oneOf("lineitem", "orders", "customer")
    cat <- Gen.oneOf(meta(t).cats)
    v <- Gen.oneOf(catDomain((t, cat)))
    num <- Gen.oneOf(meta(t).numeric)
    f <- Gen.choose(0.2, 0.8)
    q <- {
      val (lo, hi) = numRange((t, num))
      val cut = BigDecimal(lo + f * (hi - lo))
        .setScale(2, BigDecimal.RoundingMode.HALF_UP)
      val fromSql = s"(SELECT nullif($cat, '$v') AS $cat, " +
        s"CASE WHEN $num < $cut THEN NULL ELSE $num END AS $num " +
        s"FROM fuzz_$t) nv"
      val baseDf = () => tbl(t).select(
        when(col(cat) === v, lit(null)).otherwise(col(cat)).as(cat),
        when(col(num) < cut.toDouble, lit(null)).otherwise(col(num))
          .as(num))
      withTail(s"nulls:$t", fromSql, baseDf, Seq(cat), Seq(num), Nil, Nil)
    }
  } yield q

  // ---- scalar expressions: string/date/math function compositions ---
  // A random derived projection (one string fn over a categorical, one
  // date-part fn, one arithmetic composition) built in a subquery,
  // then folded through the standard aggregation tail — exercising
  // the SQL-function registry vs the functions._ Column builders on
  // grouping BY computed columns and aggregating OVER computed
  // columns. Functions restricted to those with identical semantics
  // in DuckDB (substring 1-based, year/month/day, round/abs/floor/
  // ceil) so failing seeds stay replayable.
  private def scalarGen: Gen[TestQuery] = for {
    t <- Gen.oneOf("lineitem", "orders")
    cat <- Gen.oneOf(meta(t).cats)
    num <- Gen.oneOf(meta(t).numeric)
    dt <- Gen.oneOf(meta(t).dates)
    sfn <- Gen.oneOf("upper", "lower", "reverse", "substr")
    dfn <- Gen.oneOf("year", "month", "day", "trunc_month")
    mfn <- Gen.oneOf("roundmul", "absdiff", "floorceil")
    ps <- predsGen(t, 1)
    q <- {
      val (lo, hi) = numRange((t, num))
      val cut = BigDecimal(lo + 0.5 * (hi - lo))
        .setScale(2, BigDecimal.RoundingMode.HALF_UP)
      val (sSql, sCol) = sfn match {
        case "upper" => (s"upper($cat)", upper(col(cat)))
        case "lower" => (s"lower($cat)", lower(col(cat)))
        case "reverse" => (s"reverse($cat)", reverse(col(cat)))
        case "substr" =>
          (s"substring($cat, 2, 3)", substring(col(cat), 2, 3))
      }
      val (dSql, dCol) = dfn match {
        case "year" => (s"year($dt)", year(col(dt)))
        case "month" => (s"month($dt)", month(col(dt)))
        case "day" => (s"day($dt)", dayofmonth(col(dt)))
        case "trunc_month" => (s"trunc($dt, 'MM')", trunc(col(dt), "MM"))
      }
      val (mSql, mCol) = mfn match {
        case "roundmul" =>
          (s"round($num * 1.5 + 2.25, 1)",
            round(col(num) * 1.5 + 2.25, 1))
        case "absdiff" =>
          (s"abs($num - $cut)", abs(col(num) - cut.toDouble))
        case "floorceil" =>
          (s"floor($num) + ceil($num)",
            floor(col(num)) + ceil(col(num)))
      }
      val where =
        if (ps.isEmpty) "" else s" WHERE ${ps.map(_._1).mkString(" AND ")}"
      val fromSql =
        s"(SELECT $sSql AS se, $dSql AS de, $mSql AS me " +
          s"FROM fuzz_$t$where) sv"
      val baseDf = () => {
        var d = tbl(t)
        ps.foreach { case (_, c) => d = d.filter(c) }
        d.select(sCol.as("se"), dCol.as("de"), mCol.as("me"))
      }
      withTail(s"scalar:$t:$sfn-$dfn-$mfn", fromSql, baseDf,
        Seq("de", "se"), Seq("me"), Nil, Nil)
    }
  } yield q

  // ---- grouping sets: ROLLUP / CUBE over two categoricals -----------
  // Multi-level aggregation has its own null-marker semantics (the
  // subtotal rows) and a dedicated planning path (Expand); the axis
  // checks DataFrame .rollup/.cube against the SQL GROUP BY ROLLUP/
  // CUBE clauses, with grouping_id disambiguating real-NULL groups
  // from subtotal rows in the ordering.
  private def rollupGen: Gen[TestQuery] = for {
    t <- Gen.oneOf("lineitem", "orders")
    mode <- Gen.oneOf("ROLLUP", "CUBE")
    ps <- predsGen(t, 1)
    aggs <- aggGen(meta(t).numeric)
  } yield {
    val keys = meta(t).cats.take(2)
    val where =
      if (ps.isEmpty) "" else s" WHERE ${ps.map(_._1).mkString(" AND ")}"
    val selectItems = keys ++
      Seq("CAST(grouping_id() AS BIGINT) AS gid",
        "CAST(count(*) AS BIGINT) AS cnt") ++ aggs.map(_._1)
    val outCols = keys ++ Seq("gid", "cnt") ++
      aggs.indices.map(i => s"a$i")
    val sql = s"SELECT ${selectItems.mkString(", ")} FROM fuzz_$t" +
      where + s" GROUP BY $mode(${keys.mkString(", ")})" +
      s" ORDER BY ${outCols.mkString(", ")}"
    val build = () => {
      var d = tbl(t)
      ps.foreach { case (_, c) => d = d.filter(c) }
      val grouped =
        if (mode == "ROLLUP") d.rollup(keys.map(col): _*)
        else d.cube(keys.map(col): _*)
      val aggCols = grouping_id().cast("long").as("gid") +:
        count(lit(1)).cast("long").as("cnt") +: aggs.map(_._2)
      grouped.agg(aggCols.head, aggCols.tail: _*)
        .orderBy(outCols.map(col): _*)
    }
    TestQuery(s"rollup:$mode:$t", sql, build)
  }

  // ---- distinct aggregates: count/sum DISTINCT beside plain aggs ----
  // DISTINCT aggregates plan through Expand + double aggregation —
  // a different physical path from plain hash aggregation, and the
  // classic source of wrong-multiplicity bugs when mixed with
  // non-distinct aggregates in the same SELECT.
  private def distinctAggGen: Gen[TestQuery] = for {
    t <- Gen.oneOf("lineitem", "orders", "customer")
    ps <- predsGen(t, 1)
    num <- Gen.oneOf(meta(t).numeric)
    dcat <- Gen.oneOf(meta(t).cats)
    useKey <- Gen.oneOf(true, false)
  } yield {
    val key = meta(t).cats.find(_ != dcat).getOrElse(dcat)
    val keys = if (useKey && key != dcat) Seq(key) else Nil
    val where =
      if (ps.isEmpty) "" else s" WHERE ${ps.map(_._1).mkString(" AND ")}"
    val selectItems = keys ++ Seq(
      s"CAST(count(DISTINCT $dcat) AS BIGINT) AS nd",
      s"sum(DISTINCT CAST($num AS DECIMAL(18,2))) AS sd",
      "CAST(count(*) AS BIGINT) AS cnt",
      s"sum(CAST($num AS DECIMAL(18,2))) AS st")
    val outCols = keys ++ Seq("nd", "sd", "cnt", "st")
    val groupBy =
      if (keys.isEmpty) "" else s" GROUP BY ${keys.mkString(", ")}"
    val sql = s"SELECT ${selectItems.mkString(", ")} FROM fuzz_$t" +
      where + groupBy + s" ORDER BY ${outCols.mkString(", ")}"
    val build = () => {
      var d = tbl(t)
      ps.foreach { case (_, c) => d = d.filter(c) }
      val aggCols = List(
        countDistinct(col(dcat)).cast("long").as("nd"),
        sum_distinct(col(num).cast(DecimalType(18, 2))).as("sd"),
        count(lit(1)).cast("long").as("cnt"),
        sum(col(num).cast(DecimalType(18, 2))).as("st"))
      val out =
        if (keys.isEmpty) d.agg(aggCols.head, aggCols.tail: _*)
        else d.groupBy(keys.map(col): _*).agg(aggCols.head, aggCols.tail: _*)
      out.orderBy(outCols.map(col): _*)
    }
    TestQuery(s"distinct:$t", sql, build)
  }

  // ---- window AGGREGATES over ROWS frames ---------------------------
  // The windowGen axis covers rank functions; this one covers framed
  // aggregation (running totals, trailing/centered windows) where the
  // frame-boundary semantics are the bug surface. Sums ride the
  // decimal cast so every frame sum is exact; the ORDER BY carries
  // the unique key so frames are deterministic.
  private def windowAggGen: Gen[TestQuery] = for {
    (t, part, ord, uniq) <- Gen.oneOf(windowTables)
    (frameSql, lo, hi) <- Gen.oneOf(
      ("ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
        Long.MinValue, 0L),
      ("ROWS BETWEEN 2 PRECEDING AND CURRENT ROW", -2L, 0L),
      ("ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING", -1L, 1L),
      ("ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING", 0L, 3L))
    fn <- Gen.oneOf("sum", "min", "max", "count")
    ps <- predsGen(t, 1)
  } yield {
    import org.apache.spark.sql.expressions.Window
    val where =
      if (ps.isEmpty) "" else s" WHERE ${ps.map(_._1).mkString(" AND ")}"
    val over = s"OVER (PARTITION BY $part ORDER BY " +
      s"${(ord +: uniq).mkString(", ")} $frameSql)"
    val aggSql = fn match {
      case "sum" => s"sum(CAST($ord AS DECIMAL(18,2))) $over"
      case "min" => s"min(CAST($ord AS DECIMAL(18,2))) $over"
      case "max" => s"max(CAST($ord AS DECIMAL(18,2))) $over"
      case "count" => s"CAST(count(*) $over AS BIGINT)"
    }
    val outCols = Seq(part) ++ uniq ++ Seq("wv")
    val sql = s"SELECT $part, ${uniq.mkString(", ")}, $aggSql AS wv " +
      s"FROM fuzz_$t$where ORDER BY ${outCols.mkString(", ")}"
    val build = () => {
      var d = tbl(t)
      ps.foreach { case (_, c) => d = d.filter(c) }
      val w = Window.partitionBy(col(part))
        .orderBy((col(ord) +: uniq.map(col)): _*)
        .rowsBetween(lo, hi)
      val wc = fn match {
        case "sum" => sum(col(ord).cast(DecimalType(18, 2))).over(w)
        case "min" => min(col(ord).cast(DecimalType(18, 2))).over(w)
        case "max" => max(col(ord).cast(DecimalType(18, 2))).over(w)
        case "count" => count(lit(1)).over(w).cast("long")
      }
      d.select((Seq(part) ++ uniq).map(col) :+ wc.as("wv"): _*)
        .orderBy(outCols.map(col): _*)
    }
    TestQuery(s"windowagg:$t:$fn", sql, build)
  }

  // navigation-function axis (r7): lag/lead pass values THROUGH, so
  // any divergence is a window ordering/frame bug, not arithmetic
  private def navGen: Gen[TestQuery] = for {
    (t, part, ord, uniq) <- Gen.oneOf(windowTables)
    fn <- Gen.oneOf("lag", "lead")
    k <- Gen.choose(1, 3)
    desc <- Gen.oneOf(true, false)
    ps <- predsGen(t, 1)
  } yield {
    val dir0 = if (desc) "DESC" else "ASC"
    val orderSql = (s"$ord $dir0" +: uniq).mkString(", ")
    val where =
      if (ps.isEmpty) "" else s" WHERE ${ps.map(_._1).mkString(" AND ")}"
    val sql =
      s"SELECT $part, $ord, ${uniq.mkString(", ")}, " +
        s"$fn($ord, $k) OVER (PARTITION BY $part " +
        s"ORDER BY $orderSql) AS nav FROM fuzz_$t$where " +
        s"ORDER BY ${(Seq(part, ord) ++ uniq).mkString(", ")}"
    val build = () => {
      import org.apache.spark.sql.expressions.Window
      var d = tbl(t)
      ps.foreach { case (_, c) => d = d.filter(c) }
      val ordCols = (if (desc) col(ord).desc else col(ord).asc) +:
        uniq.map(col)
      val w = Window.partitionBy(col(part)).orderBy(ordCols: _*)
      val f = if (fn == "lag") lag(col(ord), k) else lead(col(ord), k)
      d.select((Seq(part, ord) ++ uniq).map(col) :+
          f.over(w).as("nav"): _*)
        .orderBy((Seq(part, ord) ++ uniq).map(col): _*)
    }
    TestQuery(s"nav:$t:$fn$k", sql, build)
  }

  private def queryGen: Gen[TestQuery] =
    Gen.frequency((4, singleGen), (5, join2Gen), (2, join3Gen),
      (3, windowGen), (2, setOpGen), (2, nullSingleGen),
      (3, scalarGen), (2, rollupGen), (2, distinctAggGen),
      (2, windowAggGen), (2, navGen))

  // ---- the differential check ----------------------------------------
  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map {
      case null => "NULL"
      case d: java.math.BigDecimal => d.stripTrailingZeros.toPlainString
      case x => x.toString
    }.mkString("|")).toSeq

  test("300 seeded random queries: DataFrame-API and SQL-text " +
    "formulations agree row-for-row (predicates, group keys, " +
    "aggregates, HAVING, join types, join orders, window ranks, " +
    "set operations, derived-null semantics, ROLLUP/CUBE, " +
    "DISTINCT aggregates, framed window aggregates, lag/lead navigation)") {
    frames // force view registration
    var ran = 0
    (0 until 300).foreach { i =>
      queryGen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach { q =>
        val viaSql = canon(spark.sql(q.sql))
        val viaDf = canon(q.df())
        assert(viaDf == viaSql,
          s"seed=$i ${q.label}: DataFrame and SQL results differ\n" +
            s"SQL: ${q.sql}\n" +
            s"df=${viaDf.take(5)}... sql=${viaSql.take(5)}...")
        ran += 1
      }
    }
    info(s"$ran seeded comparisons ran")
    assert(ran >= 265, s"only $ran of 300 seeds produced a query")
  }

  test("partitioning-independence axis: 60 seeds re-run with inputs " +
    "repartitioned to 1 and to 7 agree with the SQL path exactly " +
    "(the r7 work-model sizing must never change a result)") {
    frames // force view registration + stats sampling on base frames
    def withParts(parts: Int)(body: => Unit): Unit = {
      frameOverride = frames.map { case (n, df) =>
        n -> (if (parts == 1) df.coalesce(1) else df.repartition(parts))
      }
      try body finally frameOverride = Map.empty
    }
    var ran = 0
    (0 until 60).foreach { i =>
      queryGen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach { q =>
        val viaSql = canon(spark.sql(q.sql)) // base partitioning
        Seq(1, 7).foreach { parts =>
          withParts(parts) {
            val viaDf = canon(q.df())
            assert(viaDf == viaSql,
              s"seed=$i parts=$parts ${q.label}: result depends on " +
                s"input partitioning\nSQL: ${q.sql}\n" +
                s"df=${viaDf.take(5)}... sql=${viaSql.take(5)}...")
          }
        }
        ran += 1
      }
    }
    info(s"$ran seeds x 2 partitionings ran")
    assert(ran >= 50, s"only $ran of 60 seeds produced a query")
  }

  test("skew axis: 60 seeds over a 94%-one-key clone of the join keys " +
    "(hot customer, hot supplier) — both formulations agree exactly " +
    "under pathological skew (VERDICT r7 #8)") {
    frames // force base view registration + stats sampling
    // deterministic one-hot remap (SkewClone.oneHot, 15/16 = 93.75%):
    // orders onto one customer, lineitems onto one supplier — the
    // uniform fixtures never stress AQE skew splits / hash-agg
    // fallback end-to-end
    val hotCust = frames("customer")
      .agg(min(col("c_custkey"))).collect()(0).getLong(0)
    val hotSupp = frames("supplier")
      .agg(min(col("s_suppkey"))).collect()(0).getLong(0)
    val skewed: Map[String, DataFrame] = frames.map { case (n, df) =>
      val s = n match {
        case "orders" => graft.tools.SkewClone.oneHot(
          df, "o_custkey", hotCust, col("o_orderkey"))
        case "lineitem" => graft.tools.SkewClone.oneHot(
          df, "l_suppkey", hotSupp,
          col("l_orderkey"), col("l_linenumber"))
        case _ => df
      }
      n -> s.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
    try {
      // BOTH paths must see the skewed data: the SQL path through
      // re-pointed fuzz_ views, the DataFrame path through the override
      skewed.foreach { case (n, df) =>
        df.createOrReplaceTempView(s"fuzz_$n")
      }
      frameOverride = skewed
      var ran = 0
      (0 until 60).foreach { i =>
        queryGen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach { q =>
          val viaSql = canon(spark.sql(q.sql))
          val viaDf = canon(q.df())
          assert(viaDf == viaSql,
            s"seed=$i ${q.label}: formulations diverge under key " +
              s"skew\nSQL: ${q.sql}\n" +
              s"df=${viaDf.take(5)}... sql=${viaSql.take(5)}...")
          ran += 1
        }
      }
      info(s"$ran seeds ran on the skew clone")
      assert(ran >= 50, s"only $ran of 60 seeds produced a query")
    } finally {
      frameOverride = Map.empty
      frames.foreach { case (n, df) =>
        df.createOrReplaceTempView(s"fuzz_$n")
      }
      skewed.values.foreach(_.unpersist())
    }
  }
}
