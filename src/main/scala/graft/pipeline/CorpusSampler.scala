package graft.pipeline

import graft.model.TableId
import graft.ops.Sampling
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic sampling and temperature mixing as YAML pipeline surfaces
  * — the `split:` precedent ([[CorpusSplitter]]) applied to the other two
  * curation reads an operator drives after a pipeline materializes a
  * corpus: [[Sampling.stratified]]/[[Sampling.hashSample]] (the `sample:`
  * block, read via `graft.Cli sample-select`) and
  * [[Sampling.temperatureRebalance]] (the `mix:` block, read via
  * `graft.Cli mix-select`). Like `split:` these extend the reference's
  * primary entry point (the YAML pipeline,
  * flink-cdc-cli/.../CliFrontend.java:66-81) with engine-side blocks.
  *
  * ```yaml
  * sample:
  *   - source-table: out.docs        # selector over routed SINK ids
  *     key: doc_id                   # any SQL expression
  *     stratum: lang                 # omit + give `rate:` for uniform
  *     rates: "en:0.25,de:0.5"       # per-stratum keep rates
  *     default-rate: 1.0             # unlisted strata (default 1.0)
  * mix:
  *   - source-table: out.docs
  *     key: doc_id
  *     stratum: lang
  *     temperature: 2.0              # q_d ∝ n_d^(1/T); or `alpha:` directly
  * ```
  *
  * Neither block maintains an asset. A `sample:` read is a pure function
  * of the key (md5-threshold membership) — stable under re-partitioning,
  * re-runs, appends, and engine replays, a narrow codegen'd filter over
  * the table scan. A `mix:` read derives its per-stratum rates from the
  * CURRENT table's counts (one bounded decision-table aggregate — a row
  * per stratum) and then applies the same md5 thresholds; it is
  * deterministic per table state, and re-derives when the table grows —
  * exactly the semantics a mixing rule wants (the mix tracks the corpus,
  * not a snapshot). Both are scan-bound at 100 TB.
  */
final case class SampleDef(
    sourceTable: String,
    key: String,
    rate: Option[Double],
    stratum: Option[String],
    rates: Seq[(String, Double)],
    defaultRate: Double) {
  // refuse at definition time, not with a Sampling error at first read
  // (the SplitDef stance)
  require(rate.isDefined != stratum.isDefined,
    "sample block needs exactly one of `rate` (uniform) or `stratum` (stratified)")
  require(rate.isEmpty || rates.isEmpty,
    "`rates` requires `stratum` — a uniform `rate` block cannot also list per-stratum rates")
  require(stratum.isEmpty || rates.nonEmpty,
    "stratified sample block needs `rates` (name:rate pairs)")
  (rate.toSeq ++ rates.map(_._2) :+ defaultRate).foreach(r =>
    require(r >= 0 && r <= 1, s"sample rates must be in [0,1]: $r"))
  require(rates.map(_._1).distinct.size == rates.size,
    s"sample strata must be unique: ${rates.map(_._1).mkString(", ")}")
  lazy val selectors: graft.model.Selectors = graft.model.Selectors.parse(sourceTable)
}

final case class MixDef(
    sourceTable: String,
    key: String,
    stratum: String,
    alpha: Double) {
  require(alpha > 0 && alpha <= 1,
    s"mix alpha must be in (0,1] (temperature ≥ 1): $alpha")
  lazy val selectors: graft.model.Selectors = graft.model.Selectors.parse(sourceTable)
}

object CorpusSampler {

  /** The deterministic sample of the sink's MATERIALIZED table — a narrow
    * md5-threshold filter over the table scan; no asset, no shuffle,
    * scan-bound at 100 TB.
    */
  def select(spark: SparkSession, p: PipelineDef, tableId: String): DataFrame = {
    val id = TableId.parse(tableId)
    val s = p.samples.find(_.selectors.matches(id)).getOrElse(
      throw new IllegalArgumentException(
        s"no sample block matches table $tableId (have: " +
          s"${p.samples.map(_.sourceTable).mkString(", ")})"))
    val table = BudgetCurator.materializedTable(spark, p, id)
    s.stratum match {
      case Some(st) => Sampling.stratified(table, expr(s.key), expr(st),
        s.rates.toMap, s.defaultRate)
      case None => Sampling.hashSample(table, expr(s.key), s.rate.get)
    }
  }
}

object CorpusMixer {

  /** The temperature-mixed view of the sink's MATERIALIZED table: one
    * bounded per-stratum count aggregate derives the `n^α` keep rates
    * (the decision table — a row per stratum), then the same narrow
    * md5-threshold filter as `sample:` applies them. Scan + one bounded
    * aggregate at 100 TB; never a shuffle of the corpus itself.
    */
  def select(spark: SparkSession, p: PipelineDef, tableId: String): DataFrame = {
    val id = TableId.parse(tableId)
    val m = p.mixes.find(_.selectors.matches(id)).getOrElse(
      throw new IllegalArgumentException(
        s"no mix block matches table $tableId (have: " +
          s"${p.mixes.map(_.sourceTable).mkString(", ")})"))
    Sampling.temperatureRebalance(
      BudgetCurator.materializedTable(spark, p, id),
      expr(m.key), expr(m.stratum), m.alpha)
  }
}
