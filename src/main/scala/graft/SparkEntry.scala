package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{AdvancedQueries, CoreQueries, ExtraQueries, Round2Queries, Round3Queries, Round4Queries, Round4bQueries, Round5Queries, Round5bQueries, Round5cQueries, Round5dQueries, Round5eQueries, Round5fQueries, Round6Queries, Round6bQueries, Round8Queries, Round9Queries, Round9cQueries, Round10Queries, Round10bQueries, Round10cQueries, Round11Queries, Round11bQueries, Round12Queries, Round12bQueries, Round12cQueries, Round13Queries, Round14Queries, Round15Queries, Round15bQueries, Round16Queries, Round17Queries, Round18Queries, Round19Queries}
import graft.operators.{BloomFilterCert, BpeTrain, ClusterEval, CmsJoinSize, ConnectedComponents, CsvIngest, Dedup, DpRelease, Dsir, EntityResolution, FuzzyJoin, HybridRetrieval, IncrementalDedup, IvfPq, KMeansLite, KmvSketch, Labeling, LangModel, LeakageSplit, LineOps, LshTuning, MmrDiversify, Multimodal, NaiveBayes, ProductQuant, RandomProjection, Retrieval, RetrievalEval, Similarity, TextAnalysis, VocabGrowth, ZOrder}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Every declared query (SURVEY.md §2.C + north-star operators). */
  def defs: Seq[QueryDef] =
    CoreQueries.all ++ Dedup.queries ++ Similarity.queries ++
      TextAnalysis.queries ++ Multimodal.queries ++ ExtraQueries.all ++
      AdvancedQueries.all ++ graft.streaming.StreamingOps.queries ++
      Round2Queries.all ++ Round3Queries.all ++ Round4Queries.all ++
      Round4bQueries.all ++ graft.functions.TopKAggregator.queries ++
      Round5Queries.all ++ KMeansLite.queries ++ ZOrder.queries ++
      Round5bQueries.all ++ Round5cQueries.all ++ Round5dQueries.all ++
      Round5eQueries.all ++ Round5fQueries.all ++ Round6Queries.all ++
      IncrementalDedup.queries ++ LineOps.queries ++ Round6bQueries.all ++
      FuzzyJoin.queries ++ Round8Queries.all ++ Round9Queries.all ++
      ProductQuant.queries ++ BpeTrain.queries ++ IvfPq.queries ++
      BloomFilterCert.queries ++ CmsJoinSize.queries ++
      Retrieval.queries ++ LangModel.queries ++ ConnectedComponents.queries ++
      Labeling.queries ++ LeakageSplit.queries ++ Round9cQueries.all ++
      RandomProjection.queries ++ Round10Queries.all ++ Round10bQueries.all ++
      Round10cQueries.all ++ Round11Queries.all ++ Round11bQueries.all ++
      NaiveBayes.queries ++ Dsir.queries ++ Round12Queries.all ++
      LshTuning.queries ++ MmrDiversify.queries ++ Round12bQueries.all ++
      RetrievalEval.queries ++ Round12cQueries.all ++ HybridRetrieval.queries ++
      VocabGrowth.queries ++ ClusterEval.queries ++ EntityResolution.queries ++
      DpRelease.queries ++ KmvSketch.queries ++ CsvIngest.queries ++
      Round13Queries.all ++ Round14Queries.all ++ Round15Queries.all ++
      Round15bQueries.all ++ Round16Queries.all ++ Round17Queries.all ++ Round18Queries.all ++ Round19Queries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Q8 (TPC-H Q1 shape): scan→project→partial/final agg→sort end-to-end.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q08_group_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(d => d.name -> d.spark).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    defs.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
