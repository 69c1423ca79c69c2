package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Set operations + Values (SURVEY.md §2.6): union all, union distinct,
  * intersect, except, inline values. Reference: StreamExecUnion.java:45,
  * ReplaceIntersectWithSemiJoinRule.java, ReplaceMinusWithAntiJoinRule.java,
  * StreamExecValues.java:44.
  */
object SetOpQueries {

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "q_union_all",
      (s, dir) => {
        val e = Tables.events(s, dir)
        val clicks = e.where(col("event_type") === "click").select(col("user_id"))
        val buys = e.where(col("event_type") === "purchase").select(col("user_id"))
        clicks.union(buys)
          .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
          .orderBy(col("user_id"))
      },
      Some("""
        SELECT user_id, COUNT(*) AS n FROM (
          SELECT user_id FROM events WHERE event_type = 'click'
          UNION ALL
          SELECT user_id FROM events WHERE event_type = 'purchase'
        ) GROUP BY user_id ORDER BY user_id
      """.trim)),

    QueryDef(
      "q_union_distinct",
      (s, dir) => {
        val e = Tables.events(s, dir)
        e.where(col("event_type") === "click").select(col("user_id"))
          .union(e.where(col("event_type") === "error").select(col("user_id")))
          .distinct()
          .orderBy(col("user_id"))
      },
      Some("""
        SELECT user_id FROM events WHERE event_type = 'click'
        UNION
        SELECT user_id FROM events WHERE event_type = 'error'
        ORDER BY user_id
      """.trim)),

    QueryDef(
      "q_intersect",
      (s, dir) => {
        val e = Tables.events(s, dir)
        e.where(col("event_type") === "click").select(col("user_id"))
          .intersect(
            e.where(col("event_type") === "purchase").select(col("user_id")))
          .orderBy(col("user_id"))
      },
      Some("""
        SELECT user_id FROM events WHERE event_type = 'click'
        INTERSECT
        SELECT user_id FROM events WHERE event_type = 'purchase'
        ORDER BY user_id
      """.trim)),

    QueryDef(
      "q_except",
      (s, dir) => {
        val e = Tables.events(s, dir)
        e.where(col("event_type") === "click").select(col("user_id"))
          .except(
            e.where(col("event_type") === "error").select(col("user_id")))
          .orderBy(col("user_id"))
      },
      Some("""
        SELECT user_id FROM events WHERE event_type = 'click'
        EXCEPT
        SELECT user_id FROM events WHERE event_type = 'error'
        ORDER BY user_id
      """.trim)),

    // Multiset set-ops (the reference's EXCEPT ALL / INTERSECT ALL forms,
    // rewritten by its planner via REPLICATE_ROWS): multiplicity-aware
    // membership over per-event user occurrences.
    QueryDef(
      "q_except_all",
      (s, dir) => {
        val e = Tables.events(s, dir)
        e.where(col("event_type") === "click").select(col("user_id"))
          .exceptAll(
            e.where(col("event_type") === "view").select(col("user_id")))
          .orderBy(col("user_id"))
      },
      Some("""
        SELECT user_id FROM events WHERE event_type = 'click'
        EXCEPT ALL
        SELECT user_id FROM events WHERE event_type = 'view'
        ORDER BY user_id
      """.trim)),

    QueryDef(
      "q_intersect_all",
      (s, dir) => {
        val e = Tables.events(s, dir)
        e.where(col("event_type") === "click").select(col("user_id"))
          .intersectAll(
            e.where(col("event_type") === "view").select(col("user_id")))
          .orderBy(col("user_id"))
      },
      Some("""
        SELECT user_id FROM events WHERE event_type = 'click'
        INTERSECT ALL
        SELECT user_id FROM events WHERE event_type = 'view'
        ORDER BY user_id
      """.trim)),

    // Inline literal rows (LocalRelation — no scan at all).
    QueryDef(
      "q_values",
      (s, _) => {
        import s.implicits._
        Seq((1, "a", 10.5), (2, "b", 20.25), (3, "c", -1.0))
          .toDF("id", "tag", "x")
          .select(
            col("id"), col("tag"),
            (col("x") * 2).as("x2"),
            upper(col("tag")).as("tag_up"))
          .orderBy(col("id"))
      },
      Some("""
        SELECT id, tag, x * 2 AS x2, upper(tag) AS tag_up
        FROM (VALUES (1, 'a', 10.5), (2, 'b', 20.25), (3, 'c', -1.0)) t(id, tag, x)
        ORDER BY id
      """.trim))
  )
}
