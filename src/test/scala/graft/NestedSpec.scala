package graft

import org.apache.spark.sql.functions._
import graft.river.Nested

/** ES nested query/agg semantics (graft.river.Nested) vs naive Scala
  * recomputes on the flat event rows, plus the load-bearing check that
  * the per-element (`nested`) conjunction differs from the flat
  * cross-element conjunction on this corpus. */
class NestedSpec extends SparkSpec {

  private case class Item(parent: Option[String], value: Double)

  // naive local replay of nestedDocs' item derivation
  private lazy val itemsLocal: Map[(Long, Long), Seq[Item]] =
    Tables.events(spark, sfDir)
      .select(col("user_id"), (unix_micros(col("ts")) / 86400000000L).cast("long"),
        col("event_type"), get_json_object(col("props"), "$.k").cast("long"),
        col("value"))
      .collect()
      .map { r =>
        val parent = if (r.getLong(3) % 3 == 0) None else Some(r.getString(2))
        ((r.getLong(0), r.getLong(1)), Item(parent, r.getDouble(4)))
      }
      .toSeq.groupBy(_._1).view.mapValues(_.map(_._2)).toMap

  private lazy val docs = Nested.nestedDocs(Tables.events(spark, sfDir)).cache()

  test("nestedMatch equals the naive per-element recompute") {
    val got = Nested.nestedMatch(docs, "click", 15.0).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3)))).toMap
    val want = itemsLocal.view.mapValues { its =>
      (its.size.toLong,
        its.count(i => i.parent.contains("click") && i.value >= 15.0).toLong)
    }.filter(_._2._2 > 0).toMap
    assert(got === want)
  }

  test("nestedSort orders parents by min matching-item value with " +
      "missing last (r15)") {
    val got = Nested.nestedSort(docs, "click", 25).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(got.length == 25)
    // naive: min over click items, None when absent, nulls-last order
    val want = itemsLocal.toSeq.map { case (k, its) =>
      val vs = its.filter(_.parent.contains("click")).map(_.value)
      (k, its.size.toLong, if (vs.isEmpty) None else Some(vs.min))
    }.sortBy { case ((u, d), _, sv) =>
      (sv.isEmpty, sv.getOrElse(0.0), u, d)
    }.take(25)
    assert(got.toSeq == want)
    // the fixture exercises real ordering (distinct sort keys present)
    assert(got.flatMap(_._3).distinct.length > 1)
  }

  test("per-element conjunction is load-bearing vs the flat cross-element form") {
    val nested = Nested.nestedMatch(docs, "click", 15.0).count()
    val flat = itemsLocal.values.count(its =>
      its.exists(_.parent.contains("click")) && its.exists(_.value >= 15.0))
    assert(nested < flat, s"nested=$nested should be < flat=$flat on this corpus")
    assert(nested > 0)
  }

  test("nestedExists equals the naive recompute and excludes all-flat docs") {
    val got = Nested.nestedExists(docs).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3)))).toMap
    val want = itemsLocal.view.mapValues { its =>
      (its.size.toLong, its.count(_.parent.nonEmpty).toLong)
    }.filter(_._2._2 > 0).toMap
    assert(got === want)
    assert(got.size < itemsLocal.size, "some parent docs must be all-flat")
  }

  test("nestedTermsAgg counts nested docs and reverse_nested parent docs") {
    val got = Nested.nestedTermsAgg(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val flatItems = itemsLocal.toSeq.flatMap { case (k, its) =>
      its.collect { case Item(Some(p), _) => (p, k) }
    }
    val want = flatItems.groupBy(_._1).view.mapValues { xs =>
      (xs.size.toLong, xs.map(_._2).distinct.size.toLong)
    }.toMap
    assert(got === want)
    // reverse_nested: parent-doc counts must be strictly below item counts
    assert(got.values.forall { case (items, parents) => parents <= items })
  }

  test("reverseNestedAgg aggregates at parent grain, once per parent " +
      "per bucket (r15)") {
    val got = Nested.reverseNestedAgg(docs).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    def money(d: Double) = BigDecimal(d).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    val want = itemsLocal.toSeq.flatMap { case (k, its) =>
      val pItems = its.size.toLong
      val pValue = its.map(i => money(i.value)).sum
      its.flatMap(_.parent).distinct.map(p => (p, k, pItems, pValue))
    }.groupBy(_._1).view.mapValues { xs =>
      (xs.size.toLong, xs.map(_._3).sum, xs.map(_._4).sum.toDouble)
    }.toMap
    assert(got === want)
    // the once-per-parent grain is load-bearing: a parent with
    // multiple items of one term contributes its metrics ONCE, so the
    // bucket's parent-item sum differs from item-grain counting
    val itemGrain = itemsLocal.toSeq.flatMap { case (_, its) =>
      its.collect { case Item(Some(p), _) => p }
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got.exists { case (p, (_, sumItems, _)) => sumItems != itemGrain(p) },
      "parent-grain sums must differ from item-grain counting somewhere")
  }
}
