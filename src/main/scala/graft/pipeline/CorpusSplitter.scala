package graft.pipeline

import graft.model.TableId
import graft.ops.Sampling
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Leakage-free deterministic splits as a YAML pipeline surface — the
  * `budget-select` precedent ([[BudgetCurator]]) applied to
  * [[Sampling.splitColumn]]: a `split:` block declares named splits over
  * a routed sink table, and `graft.Cli split-select <pipeline.yaml>
  * <table-id> <split-name> [outDir]` reads (or materializes) one split of
  * the sink's materialized table, so operators drive train/valid/test
  * handoffs without writing Scala. Like the curate read surface this
  * extends the reference's primary entry point (the YAML pipeline,
  * flink-cdc-cli/.../CliFrontend.java:66-81) with an engine-side block.
  *
  * ```yaml
  * split:
  *   - source-table: out.docs          # selector over routed SINK ids
  *     key: doc_id                     # any SQL expression
  *     splits: "train:0.9,valid:0.05,test:0.05"
  * ```
  *
  * Unlike `curate:` there is NO maintained asset: a split is a pure
  * function of the key (md5-band membership), so every read recomputes a
  * narrow codegen'd projection over the table scan — stable under
  * re-partitioning, re-runs, appends, and engine replays (the DuckDB
  * oracle recomputes the same bands). Leakage-freedom comes from the key
  * EXPRESSION: key on a group id (source domain, near-dup cluster
  * representative) and every member of a group lands in the same split.
  */
final case class SplitDef(
    sourceTable: String,
    key: String,
    weights: Seq[(String, Double)]) {
  // refuse at definition time, not with a splitColumn error at first read
  // (the CurateDef stance)
  require(weights.nonEmpty, "split block needs at least one named split")
  require(weights.map(_._1).distinct.size == weights.size,
    s"split names must be unique: ${weights.map(_._1).mkString(", ")}")
  require(weights.forall(_._2 > 0),
    s"split weights must be positive: $weights")
  require(math.abs(weights.map(_._2).sum - 1.0) < 1e-9,
    s"split weights must sum to 1: $weights")
  lazy val selectors: graft.model.Selectors = graft.model.Selectors.parse(sourceTable)
}

object SplitDef {

  /** Parse a YAML name:number list — `"train:0.8,valid:0.1,test:0.1"`
    * (the `split:` block's `splits:`, the `sample:` block's `rates:`).
    * `what` names the field in refusals so a sample-block typo doesn't
    * report as a split error.
    */
  def parseWeights(s: String, what: String = "split weights"): Seq[(String, Double)] =
    s.split(",").toSeq.map(_.trim).filter(_.nonEmpty).map { p =>
      p.split(":") match {
        case Array(n, w) if n.trim.nonEmpty =>
          val weight =
            try w.trim.toDouble
            catch {
              case _: NumberFormatException => throw new IllegalArgumentException(
                s"$what must be numeric, got '$p'")
            }
          n.trim -> weight
        case _ => throw new IllegalArgumentException(
          s"$what must be name:number pairs, got '$p'")
      }
    }
}

object CorpusSplitter {

  /** One named split of the sink's MATERIALIZED table — a narrow filter
    * ([[Sampling.splitColumn]] equality) over the table scan; no asset,
    * no shuffle, scan-bound at 100 TB. Refuses an undeclared split name
    * (a typo must not silently return an empty frame).
    */
  def select(spark: SparkSession, p: PipelineDef, tableId: String,
             splitName: String): DataFrame = {
    val id = TableId.parse(tableId)
    val s = p.splits.find(_.selectors.matches(id)).getOrElse(
      throw new IllegalArgumentException(
        s"no split block matches table $tableId (have: " +
          s"${p.splits.map(_.sourceTable).mkString(", ")})"))
    require(s.weights.exists(_._1 == splitName),
      s"unknown split '$splitName' — declared: " +
        s.weights.map(_._1).mkString(", "))
    BudgetCurator.materializedTable(spark, p, id)
      .where(Sampling.splitColumn(expr(s.key), s.weights) === splitName)
  }
}
