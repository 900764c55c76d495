package graft

import graft.queries._

/** The complete query/operator inventory, one place. Every group file
  * contributes `Seq[QueryDef]`; SparkEntry derives the driver contract
  * (queries + oracleSql maps) from this list. Names must be unique.
  */
object Catalog {
  def all: Seq[QueryDef] =
    RelationalQueries.all ++
    TemporalQueries.all ++
    StringQueries.all ++
    MathQueries.all ++
    AggregateQueries.all ++
    HashBitwiseQueries.all ++
    CollectionQueries.all ++
    CastQueries.all ++
    DedupQueries.all ++
    SimilarityQueries.all ++
    TextQueries.all ++
    MultimodalQueries.all ++
    EngineQueries.all ++
    OperatorExtraQueries.all ++
    ConditionalQueries.all ++
    VectorOpsQueries.all ++
    PipelineQueries.all ++
    TemporalJoinQueries.all ++
    TpchQueries.all ++
    TpchPartsuppQueries.all ++
    GraphQueries.all ++
    SamplingQueries.all ++
    CorpusCleanQueries.all ++
    SourceFormatQueries.all ++
    QualityMixQueries.all ++
    ChangeDataQueries.all ++
    LayoutQueries.all ++
    EventAnalyticsQueries.all ++
    ProbeQueries.all ++
    TpcdsArchetypeQueries.all ++
    TpcdsStarQueries.all

  /** Fails fast on duplicate query names (would silently drop entries in
    * the Map conversion otherwise). */
  def validated: Seq[QueryDef] = {
    val dups = all.groupBy(_.name).filter(_._2.size > 1).keys
    require(dups.isEmpty, s"duplicate query names: ${dups.mkString(",")}")
    all
  }
}
