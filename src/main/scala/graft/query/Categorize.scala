package graft.query

import graft.expr.TextMatch
import graft.ops.Dedup
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ES `categorize_text` agg (x-pack ML) — log-message categorization:
  * messages group by their structural template, with the numeric /
  * variable parts treated as wildcards ("user 1463 logged in" and
  * "user 2001 logged in" are one category).
  *
  * The deterministic core implemented here is ES's tokenization rule —
  * tokens containing digits are variable parts and never participate in
  * the category key — with EXACT key equality, i.e. ES at
  * `similarity_threshold: 100` (every non-variable token must match).
  * [[categorizeMerged]] adds the sub-100 threshold as a CONNECTED-
  * COMPONENTS closure over the exact categories, a deliberately
  * order-free restatement: ES's own sub-100 merging is incremental
  * against a stream-ordered category list (and per-shard before
  * reduction), so its category boundaries depend on document order —
  * the class of nondeterminism this repo's oracle gate cannot hold and
  * the CC form removes rather than emulates. Tokens here go through the
  * repo's standard analyzer (lowercased) where ES's ml tokenizer is
  * case-preserving — the one-analyzer convention every text operator in
  * this library shares.
  */
object Categorize {

  /** The row-local category key: analyzed tokens with every
    * digit-bearing token dropped, space-joined. A message of ONLY
    * variable tokens keys to the empty string — kept as a real category
    * (the "pure payload" bucket), not special-cased.
    */
  def categoryKey(msg: Column): Column =
    array_join(
      filter(split(trim(TextMatch.normalized(msg)), " "),
        t => t =!= "" && !t.rlike("[0-9]")),
      " ")

  /** `categorize_text` at `similarity_threshold: 100`: ONE hash
    * aggregate over the row-local key — top `size` categories by doc
    * count, key ascending on ties (the explicit-tiebreak convention).
    * Categories are template-shaped, so cardinality is
    * vocabulary-sized — the top-k cut runs over |categories|, never
    * |rows|.
    */
  def categorizeText(df: DataFrame, msgCol: Column, size: Int = 10): DataFrame = {
    require(size >= 1, s"categorize_text: size must be >= 1, got $size")
    df.select(categoryKey(msgCol).as("key"))
      .groupBy("key").agg(count(lit(1)).as("doc_count"))
      .orderBy(desc("doc_count"), asc("key"))
      .limit(size)
  }

  /** The sub-100 `similarity_threshold`, order-free (class scaladoc):
    * two exact categories connect when their DISTINCT-token overlap
    * covers at least `threshold` of the larger one
    * (`|A ∩ B| / max(|A|, |B|)` — the symmetric restatement of ES's
    * "this % of tokens must match to join"), and categories merge along
    * connected components of that relation. The merged key is the
    * representative's token sequence narrowed to tokens every member
    * shares — the same narrowing ES applies as messages join a
    * category; the representative is the lexicographically smallest
    * member key, so output is document-order-free.
    *
    * Plan shape: the exact aggregate first (corpus → vocabulary-sized
    * categories), then all pair/closure work runs on CATEGORIES only:
    * token-blocked self-join (pairs share at least one token to be
    * candidates), distinct-token overlap filter, then
    * [[Dedup.connectedComponents]] (driver union-find under its bounded
    * gate, label propagation above it). Ids are `xxhash64(key)` — the
    * portable-hash convention of the dedup family.
    */
  def categorizeMerged(df: DataFrame, msgCol: Column,
      threshold: Double = 0.7, size: Int = 10): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"categorize_text: similarity_threshold must be in (0, 1], got $threshold")
    require(size >= 1, s"categorize_text: size must be >= 1, got $size")
    val cats = df.select(categoryKey(msgCol).as("key"))
      .groupBy("key").agg(count(lit(1)).as("doc_count"))
      .withColumn("_id", xxhash64(col("key")))
      .withColumn("_toks", array_distinct(split(col("key"), " ")))
      .withColumn("_n", array_size(col("_toks")))
    val sides = cats.select(col("_id"), col("_toks"), col("_n"),
      explode(col("_toks")).as("_t"))
    val a = sides.select(col("_id").as("id_a"), col("_toks").as("_ta"),
      col("_n").as("_na"), col("_t"))
    val b = sides.select(col("_id").as("id_b"), col("_toks").as("_tb"),
      col("_n").as("_nb"), col("_t"))
    val pairs = a.join(b, Seq("_t"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "_ta", "_tb", "_na", "_nb")
      .dropDuplicates("id_a", "id_b")
      .withColumn("_shared", array_size(array_intersect(col("_ta"), col("_tb"))))
      .where(col("_shared").cast("double") >=
        lit(threshold) * greatest(col("_na"), col("_nb")).cast("double"))
      .select("id_a", "id_b")
    val comps = Dedup.connectedComponents(pairs)
    cats.join(comps, cats("_id") === comps("id"), "left")
      .withColumn("_comp", coalesce(col("component"), col("_id")))
      .groupBy("_comp")
      .agg(sum(col("doc_count")).as("doc_count"),
        min(col("key")).as("_rep"),
        collect_list(col("_toks")).as("_all"))
      .select(
        array_join(
          aggregate(col("_all"), split(col("_rep"), " "),
            (acc, t) => filter(acc, x => array_contains(t, x))),
          " ").as("key"),
        col("doc_count"))
      .orderBy(desc("doc_count"), asc("key"))
      .limit(size)
  }
}
