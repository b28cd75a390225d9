package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Engine, Registry, TestSpark}

/** Brute-force recomputation of the corpus-composition statistics on
  * sf0.001 (see operators/StatsSpec.scala for the rationale: the DuckDB
  * oracle runs the same closed form, so only an independent naive
  * recomputation catches an algebra error made identically on both
  * engine sides).
  */
class CorpusStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  private def run(name: String) = Registry.all(name).fn(spark, dir)

  private lazy val docRows: Seq[(String, String, Long, Seq[String])] =
    Engine.table(spark, dir, "documents")
      .select(col("source"), col("lang"), col("n_chars"), col("text"))
      .collect().toSeq
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getString(3).split(" ", -1).toSeq))

  private def ttrPpm(toks: Seq[String]): Long =
    toks.distinct.size.toLong * 1000000L / toks.size

  test("q_ttr equals brute-force per-doc distinct/total token shares") {
    val got = run("q_ttr").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    docRows.groupBy(_._1).foreach { case (src, rs) =>
      val ttrs = rs.map(r => ttrPpm(r._4))
      val (dis, tok) = (rs.map(_._4.distinct.size.toLong).sum,
        rs.map(_._4.size.toLong).sum)
      assert(got(src) === ((rs.size.toLong, ttrs.min, ttrs.max,
        ttrs.sum / rs.size, dis * 1000000L / tok)), s"source $src")
    }
  }

  test("q_simpson_diversity equals brute-force pair probability") {
    val got = run("q_simpson_diversity").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    docRows.groupBy(_._1).foreach { case (src, rs) =>
      val ni = rs.groupBy(_._2).values.map(_.size.toLong).toSeq
      val n = ni.sum
      val sp = if (n < 2) 0L
        else 1000000L - ni.map(x => x * (x - 1)).sum * 1000000L / (n * (n - 1))
      assert(got(src) === ((ni.size.toLong, n, sp)), s"source $src")
    }
  }

  test("q_cramers_v: phi2 matches a brute-force grid and v2 = phi2/min(r-1,c-1)") {
    val r = run("q_cramers_v").collect().head
    val (nDocs, nLangs, nSources, phi2, v2) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    val langs = docRows.map(_._2).distinct
    val sources = docRows.map(_._1).distinct
    assert((nDocs, nLangs, nSources) ===
      ((docRows.size.toLong, langs.size.toLong, sources.size.toLong)))
    val n = BigInt(docRows.size)
    val cells = docRows.groupBy(d => (d._2, d._1)).view.mapValues(_.size).toMap
    val rl = docRows.groupBy(_._2).view.mapValues(_.size).toMap
    val cl = docRows.groupBy(_._1).view.mapValues(_.size).toMap
    val expPhi2 = (for { l <- langs; s <- sources } yield {
      val a = BigInt(cells.getOrElse((l, s), 0)) * 1000000 / n
      val b = BigInt(rl(l)) * BigInt(cl(s)) * 1000000 / (n * n)
      if (b == 0) BigInt(0) else (a - b) * (a - b) * 1000 / b
    }).sum
    assert(phi2 === expPhi2.toLong)
    assert(v2 === phi2 / math.min(nLangs - 1, nSources - 1))
    assert(v2 >= 0 && v2 <= 1000000000L, "V² is a ppb share in [0, 1]")
  }

  test("q_spearman_ttr equals brute-force ×2-average-rank correlation") {
    val got = run("q_spearman_ttr").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getInt(2), r.getLong(3)))
      .toMap
    def rank2(all: Seq[Long]): Map[Long, Long] = {
      val sorted = all.sorted
      sorted.zipWithIndex.groupBy(_._1).map { case (v, xs) =>
        v -> (xs.map(_._2 + 1L).min + xs.map(_._2 + 1L).max)
      }
    }
    docRows.groupBy(_._2).foreach { case (lang, rs) =>
      val xs = rs.map(_._3)
      val ys = rs.map(r => ttrPpm(r._4))
      val (r2x, r2y) = (rank2(xs), rank2(ys))
      val pts = xs.map(r2x).map(BigInt(_)).zip(ys.map(r2y).map(BigInt(_)))
      val n = BigInt(pts.size)
      val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
      val cov = n * pts.map(p => p._1 * p._2).sum - sx * sy
      val varx = n * pts.map(p => p._1 * p._1).sum - sx * sx
      val vary = n * pts.map(p => p._2 * p._2).sum - sy * sy
      val rho2 = if (varx <= 0 || vary <= 0) BigInt(0)
        else (cov.abs * 1000 / varx) * (cov.abs * 1000 / vary)
      assert(got(lang) === ((pts.size.toLong, cov.signum, rho2.toLong)), s"lang $lang")
      assert(rho2 >= 0 && rho2 <= 1000000, "ρ² is a ppm share in [0, 1]")
    }
  }
}
