package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{Engine, Q}

/** Corpus-composition statistics: lexical diversity, source/language
  * association, and rank correlation over the `documents` table — the
  * dataset-card numbers a training-data curator reports next to the
  * Gopher-rule and drift audits (llm/TextAnalysis.scala). Not in the
  * reference (its surface is SQL passthrough, `/root/reference/
  * pandas_redshift/core.py:84`; `EXT` in SURVEY §2).
  *
  * Exactness policy: every statistic is closed in integers — floor-ppm
  * shares, ×2-scaled average ranks (a tie group spanning positions
  * (c, c+g] has 2×avg-rank = 2c+g+1), decimal(38,0)/HUGEINT-lifted moment
  * sums, and staged |cov|·1000 // var factors for ρ² (floor division only
  * ever sees non-negative operands — CLAUDE.md portability rule).
  */
object CorpusStats {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Engine.table(s, dir, "documents")

  /** Per-doc (n_tok, distinct-token count, ttr floor-ppm) projection —
    * shared by q_ttr and q_spearman_ttr so both gate the same definition.
    */
  private def ttrPerDoc(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"), col("source"), col("lang"), col("n_chars"),
        size(split(col("text"), " ")).cast(LongType).as("n_tok"),
        size(array_distinct(split(col("text"), " "))).cast(LongType).as("n_dis"))
      .filter(col("n_tok") > 0)
      .withColumn("ttr_ppm", expr("(n_dis * 1000000L) div n_tok"))

  private val ttrSqlCte: String =
    """SELECT doc_id, source, lang, n_chars,
      |    cast(len(string_split(text, ' ')) as bigint) AS n_tok,
      |    cast(len(list_distinct(string_split(text, ' '))) as bigint) AS n_dis,
      |    (cast(len(list_distinct(string_split(text, ' '))) as bigint)
      |      * 1000000) // cast(len(string_split(text, ' ')) as bigint)
      |      AS ttr_ppm
      |  FROM documents WHERE len(string_split(text, ' ')) > 0""".stripMargin

  /** 2×-average-rank cells of `valueCol` within `partCol`: one agg to
    * value cells, one window over the (bounded, value-domain-sized) cell
    * table. Returns (partCol, valueCol, rank2).
    */
  private def rank2Cells(df: DataFrame, partCol: String, valueCol: String): DataFrame = {
    val w = Window.partitionBy(col(partCol)).orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.groupBy(col(partCol), col(valueCol)).agg(count(lit(1)).as("g"))
      .withColumn("rank2", lit(2L) * sum(col("g")).over(w) - col("g") + 1L)
      .select(col(partCol), col(valueCol), col("rank2"))
  }

  val queries: Map[String, Q] = Map(

    // Type-token ratio (lexical diversity) per source: per-doc distinct/
    // total token share in floor-ppm, rolled up as min/max/floor-mean,
    // plus the pooled ratio (Σdistinct // Σtokens — the "herdan-lite"
    // corpus-level figure). Boilerplate-heavy sources sit low; fresh
    // prose sits high. Scale shape: both token counts are computed
    // doc-locally inside codegen (split + array_distinct), then ONE
    // source-keyed map-side-combinable agg — no shuffle ever carries
    // token arrays.
    "q_ttr" -> Q(
      s"""WITH d AS ($ttrSqlCte)
         |SELECT source, cast(count(*) as bigint) AS n_docs,
         |  cast(min(ttr_ppm) as bigint) AS min_ttr_ppm,
         |  cast(max(ttr_ppm) as bigint) AS max_ttr_ppm,
         |  cast(sum(ttr_ppm) // count(*) as bigint) AS avg_ttr_ppm,
         |  cast((sum(n_dis) * 1000000) // sum(n_tok) as bigint)
         |    AS pooled_ttr_ppm
         |FROM d GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
      ttrPerDoc(s, dir)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("ttr_ppm")).as("min_ttr_ppm"),
          max(col("ttr_ppm")).as("max_ttr_ppm"),
          sum(col("ttr_ppm")).as("sum_ttr"),
          sum(col("n_dis")).as("sum_dis"),
          sum(col("n_tok")).as("sum_tok"))
        .select(col("source"), col("n_docs"), col("min_ttr_ppm"),
          col("max_ttr_ppm"),
          expr("sum_ttr div n_docs").as("avg_ttr_ppm"),
          expr("(sum_dis * 1000000L) div sum_tok").as("pooled_ttr_ppm"))
        .orderBy(col("source"))
    },

    // Simpson diversity of each source's language mix: D = 1 − Σ nᵢ(nᵢ−1)
    // / (N(N−1)), the probability two random docs from the source differ
    // in language — exact rational, emitted in floor-ppm. The "is this
    // source monolingual?" dataset-card number. Scale shape: one
    // (source, lang) count agg, one source agg — both map-side
    // combinable; nothing bigger than the source×lang grid survives the
    // first shuffle.
    "q_simpson_diversity" -> Q(
      """WITH cells AS (
        |  SELECT source, lang, cast(count(*) as bigint) AS ni
        |  FROM documents GROUP BY source, lang)
        |SELECT source, cast(count(*) as bigint) AS n_langs,
        |  cast(sum(ni) as bigint) AS n_docs,
        |  cast(CASE WHEN sum(ni) < 2 THEN 0
        |       ELSE 1000000 - (sum(ni * (ni - 1)) * 1000000)
        |            // (sum(ni) * (sum(ni) - 1)) END as bigint)
        |    AS simpson_ppm
        |FROM cells GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
      docs(s, dir)
        .groupBy(col("source"), col("lang")).agg(count(lit(1)).as("ni"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_langs"), sum(col("ni")).as("n_docs"),
          sum(col("ni") * (col("ni") - 1)).as("pairs"))
        .select(col("source"), col("n_langs"), col("n_docs"),
          expr("cast(CASE WHEN n_docs < 2 THEN 0 " +
            "ELSE 1000000 - (pairs * 1000000L) div (n_docs * (n_docs - 1)) " +
            "END as bigint)").as("simpson_ppm"))
        .orderBy(col("source"))
    },

    // Cramér's V of the lang × source contingency table — the effect-size
    // companion to q_chi2_indep's per-language χ² decomposition: one
    // corpus-level "how associated are language and source?" number.
    // Same ppm-share cell arithmetic as q_chi2_indep (observed/expected
    // shares floored to ppm, per-cell ((a−b)²·1000)//b summed = 10⁹·φ²),
    // then V² = φ²/min(r−1, c−1) in ppb. Scale shape: the corpus
    // collapses to the lang×source grid in one agg; everything after is
    // grid-sized with 1-row/dim-sized broadcasts (the legal
    // crossJoin(broadcast(tiny))).
    "q_cramers_v" -> Q(
      """WITH cells AS MATERIALIZED (
        |  SELECT lang, source, cast(count(*) as bigint) AS c
        |  FROM documents GROUP BY lang, source),
        |rl AS MATERIALIZED (SELECT lang, cast(sum(c) as bigint) AS r
        |      FROM cells GROUP BY lang),
        |cl AS MATERIALIZED (SELECT source, cast(sum(c) as bigint) AS k
        |      FROM cells GROUP BY source),
        |tot AS (SELECT cast(sum(c) as bigint) AS n,
        |        (SELECT count(*) FROM rl) AS nr,
        |        (SELECT count(*) FROM cl) AS nc FROM cells),
        |grid AS (
        |  SELECT rl.lang, cl.source, rl.r, cl.k, coalesce(ce.c, 0) AS c,
        |    t.n, t.nr, t.nc
        |  FROM rl CROSS JOIN cl
        |  LEFT JOIN cells ce ON ce.lang = rl.lang AND ce.source = cl.source,
        |  tot t),
        |terms AS (
        |  SELECT nr, nc, n,
        |    cast((cast(c as hugeint) * 1000000) // n as bigint) AS a,
        |    cast((cast(r as hugeint) * k * 1000000)
        |         // (cast(n as hugeint) * n) as bigint) AS b
        |  FROM grid)
        |SELECT cast(max(n) as bigint) AS n_docs,
        |  cast(max(nr) as bigint) AS n_langs, cast(max(nc) as bigint) AS n_sources,
        |  cast(sum(CASE WHEN b = 0 THEN 0
        |           ELSE ((a - b) * (a - b) * 1000) // b END) as bigint)
        |    AS phi2_ppb,
        |  cast(CASE WHEN least(max(nr) - 1, max(nc) - 1) = 0 THEN 0
        |       ELSE sum(CASE WHEN b = 0 THEN 0
        |                ELSE ((a - b) * (a - b) * 1000) // b END)
        |            // least(max(nr) - 1, max(nc) - 1) END as bigint) AS v2_ppb
        |FROM terms ORDER BY n_docs""".stripMargin) { (s, dir) =>
      val cells = docs(s, dir)
        .groupBy(col("lang"), col("source")).agg(count(lit(1)).as("c"))
      val rl = cells.groupBy(col("lang")).agg(sum(col("c")).as("r"))
      val cl = cells.groupBy(col("source")).agg(sum(col("c")).as("k"))
      val tot = cells.agg(sum(col("c")).as("n"))
        .crossJoin(broadcast(rl.agg(count(lit(1)).as("nr"))))
        .crossJoin(broadcast(cl.agg(count(lit(1)).as("nc"))))
      rl.crossJoin(broadcast(cl))
        .join(cells, Seq("lang", "source"), "left")
        .select(col("r"), col("k"), coalesce(col("c"), lit(0L)).as("c"))
        .crossJoin(broadcast(tot))
        .select(col("n"), col("nr"), col("nc"),
          expr("cast((cast(c as decimal(38,0)) * 1000000) div n as bigint)")
            .as("a"),
          expr("cast((cast(r as decimal(38,0)) * k * 1000000)" +
            " div (cast(n as decimal(38,0)) * n) as bigint)").as("b"))
        .agg(max(col("n")).as("n_docs"), max(col("nr")).as("n_langs"),
          max(col("nc")).as("n_sources"),
          sum(expr("CASE WHEN b = 0 THEN 0" +
            " ELSE ((a - b) * (a - b) * 1000) div b END")).as("phi2_ppb"))
        .select(col("n_docs"), col("n_langs"), col("n_sources"), col("phi2_ppb"),
          // single-lang/single-source corpus: min(r-1,c-1)=0 — define V²=0
          // on BOTH engines (Spark div would NULL, DuckDB // would raise)
          expr("CASE WHEN least(n_langs - 1, n_sources - 1) = 0 THEN 0L " +
            "ELSE phi2_ppb div least(n_langs - 1, n_sources - 1) END")
            .as("v2_ppb"))
    },

    // Spearman rank correlation, per language, between document LENGTH
    // (n_chars) and lexical diversity (ttr_ppm) — the classic negative
    // length↔TTR relationship a curator checks before length-filtering.
    // ρ = Pearson on average ranks; ranks enter ×2 so ties stay integer,
    // moment sums are decimal(38,0)/HUGEINT-lifted, and ρ² is closed in
    // STAGED floor arithmetic on non-negative operands: with
    // fa = (|cov|·1000)//varx and fb = (|cov|·1000)//vary, ρ²·10⁶ ≈ fa·fb
    // — both engines run the identical integer tree, so the gate hashes
    // it. Scale shape: ranks come from value-domain cell windows (length
    // and ppm domains, never corpus rows), joined back on (lang, value);
    // the moment agg is map-side combinable. varx = 0 (a constant
    // column) degrades to ρ = 0 on both sides.
    "q_spearman_ttr" -> Q(
      s"""WITH d AS MATERIALIZED (
         |  SELECT lang, n_chars, ttr_ppm FROM ($ttrSqlCte)),
         |cx AS (
         |  SELECT lang, n_chars,
         |    2 * sum(count(*)) OVER (PARTITION BY lang ORDER BY n_chars
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      - count(*) + 1 AS rank2
         |  FROM d GROUP BY lang, n_chars),
         |cy AS (
         |  SELECT lang, ttr_ppm,
         |    2 * sum(count(*)) OVER (PARTITION BY lang ORDER BY ttr_ppm
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      - count(*) + 1 AS rank2
         |  FROM d GROUP BY lang, ttr_ppm),
         |j AS (
         |  SELECT d.lang, cast(cx.rank2 as hugeint) AS rx,
         |    cast(cy.rank2 as hugeint) AS ry
         |  FROM d JOIN cx ON d.lang = cx.lang AND d.n_chars = cx.n_chars
         |         JOIN cy ON d.lang = cy.lang AND d.ttr_ppm = cy.ttr_ppm),
         |m AS (
         |  SELECT lang, cast(count(*) as hugeint) AS n,
         |    sum(rx) AS sx, sum(ry) AS sy, sum(rx * rx) AS sxx,
         |    sum(ry * ry) AS syy, sum(rx * ry) AS sxy
         |  FROM j GROUP BY lang),
         |c AS (
         |  SELECT lang, n, n * sxy - sx * sy AS cov,
         |    n * sxx - sx * sx AS varx, n * syy - sy * sy AS vary
         |  FROM m)
         |SELECT lang, cast(n as bigint) AS n_docs,
         |  cast(CASE WHEN cov > 0 THEN 1 WHEN cov < 0 THEN -1 ELSE 0 END
         |    as int) AS rho_sign,
         |  cast(CASE WHEN varx <= 0 OR vary <= 0 THEN 0
         |       ELSE ((abs(cov) * 1000) // varx) * ((abs(cov) * 1000) // vary)
         |       END as bigint) AS rho2_ppm
         |FROM c ORDER BY lang""".stripMargin) { (s, dir) =>
      val d = ttrPerDoc(s, dir).select(col("lang"), col("n_chars"), col("ttr_ppm"))
      val cx = rank2Cells(d.select(col("lang"), col("n_chars")), "lang", "n_chars")
        .withColumnRenamed("rank2", "rx")
      val cy = rank2Cells(d.select(col("lang"), col("ttr_ppm")), "lang", "ttr_ppm")
        .withColumnRenamed("rank2", "ry")
      d.join(cx, Seq("lang", "n_chars")).join(cy, Seq("lang", "ttr_ppm"))
        .select(col("lang"),
          col("rx").cast(DecimalType(38, 0)).as("rx"),
          col("ry").cast(DecimalType(38, 0)).as("ry"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).cast(DecimalType(38, 0)).as("n"),
          sum(col("rx")).as("sx"), sum(col("ry")).as("sy"),
          sum(col("rx") * col("rx")).as("sxx"),
          sum(col("ry") * col("ry")).as("syy"),
          sum(col("rx") * col("ry")).as("sxy"))
        .select(col("lang"), col("n"),
          (col("n") * col("sxy") - col("sx") * col("sy")).as("cov"),
          (col("n") * col("sxx") - col("sx") * col("sx")).as("varx"),
          (col("n") * col("syy") - col("sy") * col("sy")).as("vary"))
        .select(col("lang"), col("n").cast(LongType).as("n_docs"),
          expr("cast(CASE WHEN cov > 0 THEN 1 WHEN cov < 0 THEN -1 ELSE 0 END" +
            " as int)").as("rho_sign"),
          expr("cast(CASE WHEN varx <= 0 OR vary <= 0 THEN 0" +
            " ELSE ((abs(cov) * 1000) div varx) * ((abs(cov) * 1000) div vary)" +
            " END as bigint)").as("rho2_ppm"))
        .orderBy(col("lang"))
    })
}
