package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Near-dup-aware train/holdout splitting — the leakage control a
  * pretraining corpus needs on top of x125's per-doc hash split: if two
  * near-duplicate documents land on opposite sides of a train/eval split,
  * the eval half is contaminated by construction (Lee et al. 2022 measure
  * exactly this train-test overlap). The fix is to split by DEDUP CLUSTER:
  * every member of a cluster inherits the split of the cluster's hash, so
  * near-dups can never straddle.
  *
  * The query is its own demonstrator pair (x133/x134 idiom in one result):
  * it applies BOTH strategies — `by_doc` (x125's rule) and `by_cluster` —
  * to the same corpus and reports, per strategy, the split sizes and the
  * number of clusters whose members straddle the boundary. `by_cluster`
  * is structurally zero; `by_doc`'s nonzero count is the measured leak.
  *
  * Scale shape (100 TB): cluster formation is the x43 plan (LSH pairs →
  * min-label components — only docs in some pair shuffle); the split
  * itself is one md5 per row (no shuffle); the audit is two hash
  * aggregates on (strategy, cluster) keys. Deterministic end-to-end: md5
  * on both engines, integer counts.
  */
object LeakageSplit {

  private val Seed = "leak-seed-1"

  val queries: Seq[QueryDef] = Seq(
    QueryDef(
      "x175_leakage_safe_split",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val clusters = Dedup.dedupClusters(
          Dedup.minhashLshPairs(docs, 0.8))
        def split(key: org.apache.spark.sql.Column) =
          when(substring(md5(concat_ws("|", key.cast("string"), lit(Seed))),
            1, 2) < "80", "train").otherwise("holdout")
        val mem = docs.select(col("doc_id"))
          .join(clusters, Seq("doc_id"), "left")
          // Singletons form their own group; a value collision between a
          // singleton's doc_id and some cluster_id only correlates their
          // coin flips — it cannot leak members across splits.
          .withColumn("gk", coalesce(col("cluster_id"), col("doc_id")))
        val st = mem.select(lit("by_doc").as("strategy"), col("cluster_id"),
            split(col("doc_id")).as("split"))
          .union(mem.select(lit("by_cluster").as("strategy"),
            col("cluster_id"), split(col("gk")).as("split")))
        val sizes = st.groupBy("strategy")
          .agg(sum(when(col("split") === "train", 1L).otherwise(0L))
            .as("n_train"),
            sum(when(col("split") === "holdout", 1L).otherwise(0L))
              .as("n_holdout"))
        val straddle = st.filter(col("cluster_id").isNotNull)
          .groupBy("strategy", "cluster_id")
          .agg(count_distinct(col("split")).as("ns"))
          .groupBy("strategy")
          .agg(sum(when(col("ns") > 1, 1L).otherwise(0L))
            .as("straddling_clusters"))
        sizes.join(straddle, "strategy")
          .select("strategy", "n_train", "n_holdout", "straddling_clusters")
          .orderBy("strategy")
      },
      Some(s"""WITH RECURSIVE
              | ${Dedup.clusterClosureCtesSql(0.8)},
              | mem AS (SELECT d.doc_id, cl.cluster_id,
              |                coalesce(cl.cluster_id, d.doc_id) AS gk
              |         FROM documents d LEFT JOIN cl USING (doc_id)),
              | st AS (
              |   SELECT 'by_doc' AS strategy, cluster_id,
              |          CASE WHEN substr(md5(CAST(doc_id AS VARCHAR) || '|' ||
              |               '$Seed'), 1, 2) < '80'
              |               THEN 'train' ELSE 'holdout' END AS split
              |   FROM mem
              |   UNION ALL
              |   SELECT 'by_cluster' AS strategy, cluster_id,
              |          CASE WHEN substr(md5(CAST(gk AS VARCHAR) || '|' ||
              |               '$Seed'), 1, 2) < '80'
              |               THEN 'train' ELSE 'holdout' END AS split
              |   FROM mem),
              | sizes AS (
              |   SELECT strategy,
              |          CAST(sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END)
              |            AS BIGINT) AS n_train,
              |          CAST(sum(CASE WHEN split = 'holdout' THEN 1 ELSE 0 END)
              |            AS BIGINT) AS n_holdout
              |   FROM st GROUP BY 1),
              | straddle AS (
              |   SELECT strategy,
              |          CAST(sum(CASE WHEN ns > 1 THEN 1 ELSE 0 END)
              |            AS BIGINT) AS straddling_clusters
              |   FROM (SELECT strategy, cluster_id,
              |                count(DISTINCT split) AS ns
              |         FROM st WHERE cluster_id IS NOT NULL
              |         GROUP BY 1, 2) c GROUP BY 1)
              |SELECT strategy, n_train, n_holdout, straddling_clusters
              |FROM sizes JOIN straddle USING (strategy)
              |ORDER BY strategy""".stripMargin))
  )
}
