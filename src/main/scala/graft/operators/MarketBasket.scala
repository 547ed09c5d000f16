package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pairwise association rules over keyed baskets (the two-itemset core
  * of Agrawal & Srikant 1994) — "orders containing part A also contain
  * part B": support, confidence and lift per directed rule.
  *
  * Scale shape — the pair self-join is the classic market-basket
  * quadratic, bounded two ways:
  *  - APRIORI pruning (downward closure): an item infrequent on its own
  *    cannot belong to a frequent pair, so only items with >=
  *    `minItemBaskets` baskets enter the self-join at all;
  *  - the pair-support floor prunes the aggregated pairs before the
  *    rule expansion, so rule rows are frequent-pair-proportional.
  * Everything shuffles on the basket key once (the self-join) and on
  * the pair key once (the count); the basket total rides a 1-row
  * broadcast.
  *
  * Integer-exact contract: support/confidence in floored ppm; lift in
  * floored micro-units via the two-step division
  * `conf_ppm * 1e6 div P(B)_ppm` — the composed floor (not the
  * real-number ratio) is the documented contract, identical in any
  * engine with truncating integer division, and no intermediate
  * product can overflow BIGINT at any input scale.
  *
  * Output: top `topK` rules by (lift desc, confidence desc, antecedent,
  * consequent) — a total order, so the cut is deterministic.
  *
  * Reference context: osarchiver has no analytics surface (SURVEY.md
  * §2.7); this extends the §2.8 north-star set.
  */
object MarketBasket {

  def pairRules(df: DataFrame, basketCol: String, itemCol: String,
      minItemBaskets: Long, minPairBaskets: Long,
      topK: Int): DataFrame = {
    require(minItemBaskets >= 1 && minPairBaskets >= 1 && topK >= 1,
      "thresholds and topK must be positive")
    // persist the distinct basket-item set: it feeds the basket total,
    // the apriori item frequencies AND both self-join legs — unpersisted,
    // every consumer re-ran the scan+distinct (r11 plan audit: the q96
    // plan held NINE parquet scans of the fact table; the aggregate legs
    // shuffle partial-agg rows, so ReuseExchange never unifies them)
    val items = PlanPersist("basket.items",
      df.select(col(basketCol).as("bk"), col(itemCol).as("it"))
        .distinct())
    val n = items.agg(countDistinct(col("bk")).as("n_baskets"))
    val freq = items.groupBy("it").agg(count(lit(1)).as("n_it"))
      .filter(col("n_it") >= minItemBaskets)
    val fitems = items.join(freq, "it")
    // persist the frequent-pair aggregate too: the directed-rule union
    // below consumes it twice (identity + swapped), which would re-run
    // the whole pair self-join per direction
    val pairs = PlanPersist("basket.pairs",
      fitems.as("a").join(fitems.as("b"),
          col("a.bk") === col("b.bk") && col("a.it") < col("b.it"))
        .groupBy(col("a.it").as("ia"), col("b.it").as("ib"))
        .agg(count(lit(1)).as("n_ab"),
          min(col("a.n_it")).as("n_a"), min(col("b.n_it")).as("n_b"))
        .filter(col("n_ab") >= minPairBaskets))
    val rules = pairs
      .select(col("ia").as("antecedent"), col("ib").as("consequent"),
        col("n_ab"), col("n_a"), col("n_b"))
      .unionAll(pairs.select(col("ib").as("antecedent"),
        col("ia").as("consequent"), col("n_ab"),
        col("n_b").as("n_a"), col("n_a").as("n_b")))
    rules.crossJoin(broadcast(n))
      .select(col("antecedent"), col("consequent"), col("n_ab"),
        expr("n_ab * 1000000 div n_baskets").as("support_ppm"),
        expr("n_ab * 1000000 div n_a").as("confidence_ppm"),
        expr("(n_ab * 1000000 div n_a) * 1000000 " +
          "div greatest(n_b * 1000000 div n_baskets, 1)").as("lift_micro"))
      .orderBy(col("lift_micro").desc, col("confidence_ppm").desc,
        col("antecedent"), col("consequent"))
      .limit(topK)
  }
}
