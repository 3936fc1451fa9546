package graft

/** Intentionally empty — and that is the design decision, not an omission.
  *
  * SURVEY.md §4 audited every mechanism in the reference with optimizer or
  * execution meaning (Luau compile-time constant folding, batch-of-one
  * dequeue, async yield offloading, payload compression, the 8 MiB frame
  * cap) and found nothing that needs a custom `LogicalPlan`, `Rule`,
  * `SparkStrategy`, or `SparkPlan`: Catalyst already provides strictly more
  * (predicate pushdown, column pruning, join reordering, partition pruning,
  * AQE, whole-stage codegen). Custom code is therefore confined to scalar/
  * aggregate expressions (graft.functions) where Spark lacks the semantics.
  *
  * The one operator that tempts a custom physical node — the as-of join
  * (J6) — ships instead as the linear union+window rewrite in
  * `operators.EventQueries` (one shuffle, bounded state), which composes
  * with AQE and codegen for free; a bespoke `AsOfJoinExec` would have to
  * re-earn both. If BENCH evidence ever demands it, the extension seam is
  * `SparkSessionExtensions.injectPlannerStrategy` — nothing in the current
  * numbers (BASELINE.md, DESIGN.md scaling table) does.
  */
package object plans
