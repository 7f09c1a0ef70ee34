package graft.operators

import graft.SparkSpec
import graft.model._
import graft.sinks.ValuesDatabase
import graft.sources.ValuesSource
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class TransformSpec extends SparkSpec {
  import spark.implicits._

  test("projection + computed column + filter") {
    val df = Seq((1, "alice", 30), (2, "bob", 15), (3, "carol", 40)).toDF("id", "name", "age")
    val out = Transform.applyRules(df, TableId.of("db", "people"), Seq(
      TransformRule("db.people",
        projection = Some("id, UPPER(name) AS name, age + 1 AS age1"),
        filter = Some("age > 18"))))
    assert(out.columns.toSeq === Seq("id", "name", "age1"))
    assert(out.orderBy("id").collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSeq ===
      Seq((1, "ALICE", 31), (3, "CAROL", 41)))
  }

  test("metadata columns resolve to the table identity") {
    val df = Seq((1, "x")).toDF("id", "v")
    val out = Transform.applyRules(df, TableId.of("ns", "sch", "tbl"), Seq(
      TransformRule("tbl", projection = Some("id, __namespace_name__ AS ns, __table_name__ AS tn"))))
    assert(out.head() === Row(1, "ns", "tbl"))
  }

  test("op_ts metadata column reflects the changelog sequence") {
    val df = Seq((1, "x", 100L)).toDF("id", "v", Changelog.SeqCol)
    val out = Transform.applyRules(df, TableId.of("db", "t"), Seq(
      TransformRule("db.t", projection = Some("id, op_ts AS changed_at"))),
      passthrough = Seq(Changelog.SeqCol))
    assert(out.select("id", "changed_at").head() === Row(1, 100L))
    // and the derived output schema resolves op_ts too
    val struct = Transform.outputStruct(spark,
      StructType(Seq(StructField("id", IntegerType), StructField("v", StringType))),
      TableId.of("db", "t"),
      Seq(TransformRule("db.t", projection = Some("id, op_ts AS changed_at"))))
    assert(struct.fieldNames.toSeq === Seq("id", "changed_at"))
  }

  test("wildcard expands to physical columns only") {
    val df = Seq((1, "x")).toDF("id", "v")
    val out = Transform.applyRules(df, TableId.of("db", "t"), Seq(
      TransformRule("t", projection = Some("*, id * 2 AS id2"))))
    assert(out.columns.toSeq === Seq("id", "v", "id2"))
  }

  test("no matching rule passes the frame through untouched") {
    val df = Seq((1, "x")).toDF("id", "v")
    val out = Transform.applyRules(df, TableId.of("db", "t"), Seq(
      TransformRule("other", projection = Some("id"))))
    assert(out.columns.toSeq === Seq("id", "v"))
  }

  test("splitTopLevel respects parens and quotes") {
    assert(Transform.splitTopLevel("a, ROUND(x, 2) AS y, CONCAT('a,b', c) AS z") ===
      Seq("a", "ROUND(x, 2) AS y", "CONCAT('a,b', c) AS z"))
  }
}

class RouterSpec extends SparkSpec {
  test("route with replace-symbol substitutes the source table name") {
    val r = new TableIdRouter(Seq(RouteRule("db.\\.*", "ods.<>", replaceSymbol = Some("<>"))))
    assert(r.route(TableId.of("db", "users")) === Seq(TableId.of("ods", "users")))
  }

  test("identity when no rule matches; fan-out on multiple matches") {
    val r = new TableIdRouter(Seq(
      RouteRule("db.users", "a.t1"), RouteRule("db.users", "b.t2")))
    assert(r.route(TableId.of("db", "users")) === Seq(TableId.of("a", "t1"), TableId.of("b", "t2")))
    assert(r.route(TableId.of("db", "other")) === Seq(TableId.of("db", "other")))
  }

  test("reverse lookup finds the upstream tables of a sink") {
    val r = new TableIdRouter(Seq(RouteRule("db.u_\\.*", "sink.merged")))
    val up = Seq(TableId.of("db", "u_1"), TableId.of("db", "u_2"), TableId.of("db", "x"))
    assert(r.sourcesFor(TableId.of("sink", "merged"), up) === Seq(TableId.of("db", "u_1"), TableId.of("db", "u_2")))
  }
}

class SaltSpec extends SparkSpec {
  import spark.implicits._

  test("skewJoin equals plain join on a skewed key") {
    val big = (1 to 1000).map(i => (if (i % 10 == 0) 1L else i.toLong, s"v$i")).toDF("k", "v")
    val small = Seq((1L, "hot"), (2L, "cold"), (500L, "mid")).toDF("k", "name")
    val plain = big.join(small, Seq("k")).select("k", "v", "name")
      .collect().map(_.toSeq).toSet
    val salted = Salt.skewJoin(big, small, Seq("k"), buckets = 8).select("k", "v", "name")
      .collect().map(_.toSeq).toSet
    assert(salted === plain)
    assert(salted.count(_.head == 1L) === 101) // hot key (i=1 + 100 multiples of 10) fully preserved
  }

  test("saltedTwoPhase collect_list merges across salt buckets") {
    import org.apache.spark.sql.functions._
    val df = (1 to 100).map(i => (i % 3, i)).toDF("k", "x")
    val out = Salt.saltedTwoPhase(df, Seq("k"), buckets = 4)(
      (d, keys) => d.groupBy(keys.map(col): _*).agg(collect_list("x").as("xs")),
      (d, keys) => d.groupBy(keys.map(col): _*).agg(flatten(collect_list("xs")).as("xs")))
    val sizes = out.select("k", "xs").collect()
      .map(r => r.getInt(0) -> r.getSeq[Int](1).size).toMap
    assert(sizes === Map(0 -> 33, 1 -> 34, 2 -> 33))
  }
}

class SchemaDerivatorSpec extends SparkSpec {
  import spark.implicits._

  test("mergeStructs widens types and unions columns in first-seen order") {
    val a = StructType(Seq(StructField("id", IntegerType), StructField("name", StringType)))
    val b = StructType(Seq(StructField("id", LongType), StructField("email", StringType)))
    val m = SchemaDerivator.mergeStructs(Seq(a, b))
    assert(m.fieldNames.toSeq === Seq("id", "name", "email"))
    assert(m("id").dataType === LongType)
  }

  test("mergeUnion null-pads and casts (the FIXTURES.md §3 route-merge shape)") {
    val u1 = Seq((1, "a")).toDF("id", "name")
    val u2 = Seq((2L, "b", "b@x.com")).toDF("id", "name", "email")
    val out = SchemaDerivator.mergeUnion(Seq(u1, u2)).orderBy("id")
    assert(out.schema("id").dataType === LongType)
    assert(out.collect().toSeq === Seq(Row(1L, "a", null), Row(2L, "b", "b@x.com")))
  }
}

class SchemaRegistrySpec extends SparkSpec {
  private val t1 = TableId.of("db", "t1")
  private def create = CreateTableEvent(t1, CdcSchema.of("id" -> "INT", "name" -> "STRING"))

  test("EVOLVE applies changes to both universes") {
    val reg = new SchemaRegistry(SchemaChangeBehavior.Evolve)
    reg.apply(create)
    val out = reg.apply(AddColumnEvent(t1, "age", IntegerType))
    assert(out === Seq(AddColumnEvent(t1, "age", IntegerType)))
    assert(reg.evolvedSchema(t1).get.columnNames === Seq("id", "name", "age"))
  }

  test("IGNORE swallows changes after create") {
    val reg = new SchemaRegistry(SchemaChangeBehavior.Ignore)
    reg.apply(create)
    assert(reg.apply(DropColumnEvent(t1, "name")).isEmpty)
    // original universe still tracks upstream truth
    assert(reg.originalSchema(t1).get.columnNames === Seq("id"))
  }

  test("LENIENT turns rename into add and defers drops") {
    val reg = new SchemaRegistry(SchemaChangeBehavior.Lenient)
    reg.apply(create)
    val out = reg.apply(RenameColumnEvent(t1, "name", "fullname"))
    assert(out === Seq(AddColumnEvent(t1, "fullname", StringType)))
    assert(reg.evolvedSchema(t1).get.columnNames === Seq("id", "name", "fullname"))
    assert(reg.apply(DropColumnEvent(t1, "id")).isEmpty)
    assert(reg.evolvedSchema(t1).get.columnNames === Seq("id", "name", "fullname"))
  }

  test("EXCEPTION rejects any change after create") {
    val reg = new SchemaRegistry(SchemaChangeBehavior.Exception)
    reg.apply(create)
    assertThrows[IllegalStateException](reg.apply(AddColumnEvent(t1, "x", IntegerType)))
  }
}

class ChangelogSpec extends SparkSpec {

  test("materialize agrees with the ValuesDatabase oracle on the canonical event set") {
    val events = ValuesSource.singleSplitSingleTable
    val db = new ValuesDatabase
    db.applyAll(events)
    val tid = TableId.of("default_namespace", "default_schema", "table1")
    val schema = db.schemaOf(tid).get

    val dataEvents = events.collect { case e: DataChangeEvent => e }
    val changelog = ValuesSource.toChangelog(spark, schema, dataEvents)
    val out = Changelog.materialize(changelog, schema.primaryKeys)
      .orderBy("col1").collect().map(r => Seq(r.get(0), r.get(1))).toSeq

    assert(out === db.results(tid).sortBy(_.head.toString))
    assert(out === Seq(Seq("1", "1"), Seq("2", "x"))) // 3 deleted, 2 updated
  }

  test("history: validity intervals chain per key; deletes close without opening") {
    import spark.implicits._
    val ch = Seq(
      ("a", "v1", "REPLACE", 1L),
      ("a", "v2", "REPLACE", 3L),  // closes v1 at 3
      ("a", "v2", "DELETE", 5L),   // closes v2 at 5, no new interval
      ("a", "v3", "REPLACE", 7L),  // re-created after delete, still open
      ("b", "w1", "REPLACE", 2L))  // single open interval
      .toDF("k", "v", Changelog.OpCol, Changelog.SeqCol)
    val out = Changelog.history(ch, Seq("k"))
      .orderBy("k", "valid_from")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3))).toSeq
    assert(out === Seq(
      ("a", "v1", 1L, 3L),
      ("a", "v2", 3L, 5L),
      ("a", "v3", 7L, -1L),
      ("b", "w1", 2L, -1L)))
    // intervals must reconstruct materialize: the open rows ARE the state
    val current = Changelog.history(ch, Seq("k")).where(col("valid_to").isNull)
      .select("k", "v").as[(String, String)].collect().toSet
    val mat = Changelog.materialize(ch, Seq("k"))
      .select("k", "v").as[(String, String)].collect().toSet
    assert(current === mat)
    // time travel: at seq 4 the delete at 5 has not happened yet
    val at4 = Changelog.asOf(Changelog.history(ch, Seq("k")), 4L)
      .select("k", "v").as[(String, String)].collect().toSet
    assert(at4 === Set(("a", "v2"), ("b", "w1")))
    // asOf at the max seq equals materialize
    val atEnd = Changelog.asOf(Changelog.history(ch, Seq("k")), 7L)
      .select("k", "v").as[(String, String)].collect().toSet
    assert(atEnd === mat)
  }

  test("materialize with a COMPOSITE primary key dedups on the full key") {
    import spark.implicits._
    val ch = Seq(
      ("a", 1L, "v1", "REPLACE", 1L),
      ("a", 2L, "v2", "REPLACE", 2L),   // different second key component: distinct row
      ("a", 1L, "v3", "REPLACE", 3L),   // supersedes ("a",1)
      ("b", 1L, "v4", "REPLACE", 4L),
      ("b", 1L, "v4", "DELETE", 5L))    // tombstone for ("b",1)
      .toDF("k1", "k2", "v", Changelog.OpCol, Changelog.SeqCol)
    val out = Changelog.materialize(ch, Seq("k1", "k2"))
      .orderBy("k1", "k2")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq
    assert(out === Seq(("a", 1L, "v3"), ("a", 2L, "v2")))
  }

  test("mergeHistory equals the full recompute at every split point") {
    import spark.implicits._
    val ch = Seq(
      ("a", "v1", "REPLACE", 1L),
      ("b", "w1", "REPLACE", 2L),
      ("a", "v2", "REPLACE", 3L),
      ("a", "v2", "DELETE", 5L),   // delete-first-in-batch case at split 4
      ("b", "w2", "REPLACE", 6L),
      ("a", "v3", "REPLACE", 7L),  // re-insert after delete
      ("c", "x1", "REPLACE", 8L))  // brand-new key in the batch
      .toDF("k", "v", Changelog.OpCol, Changelog.SeqCol)
    val full = Changelog.history(ch, Seq("k"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    for (split <- 1L to 7L) {
      val merged = Changelog.mergeHistory(
        Changelog.history(ch.where(col(Changelog.SeqCol) <= split), Seq("k")),
        ch.where(col(Changelog.SeqCol) > split), Seq("k"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
      assert(merged === full, s"split=$split")
    }
  }

  test("temporalJoin: per-row as-of cover, null in gaps, never amplifies") {
    import spark.implicits._
    val ch = Seq(
      ("a", "v1", "REPLACE", 1L),
      ("a", "v2", "REPLACE", 3L),
      ("a", "v2", "DELETE", 5L),   // gap [5,7)
      ("a", "v3", "REPLACE", 7L),
      ("b", "w1", "REPLACE", 2L))
      .toDF("k", "v", Changelog.OpCol, Changelog.SeqCol)
    val hist = Changelog.history(ch, Seq("k"))
    val probes = Seq(("a", 0L), ("a", 1L), ("a", 4L), ("a", 5L),
      ("a", 8L), ("b", 2L), ("c", 9L)).toDF("k", "at")
    val out = Changelog.temporalJoin(probes, hist, Seq("k"), col("at"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getString(2))).toSet
    assert(out === Set(
      ("a", 0L, null), // before the first version
      ("a", 1L, "v1"), // valid_from boundary is inclusive
      ("a", 4L, "v2"),
      ("a", 5L, null), // deleted gap — valid_to is exclusive
      ("a", 8L, "v3"),
      ("b", 2L, "w1"),
      ("c", 9L, null))) // unknown key survives null-extended
    // disjoint intervals per key ⇒ exactly one output row per probe
    assert(Changelog.temporalJoin(probes, hist, Seq("k"), col("at")).count() === 7L)
  }

  test("mergeAggregate equals the full recompute at every split point") {
    import spark.implicits._
    // exercises every delta case: a key MOVING between groups (retraction
    // in one group + insertion in another), an in-place update, a delete
    // that empties a group (the group must vanish — decimal cancellation
    // to exact zero), and a brand-new group appearing mid-stream
    val ch = Seq(
      (1L, "a", 0.1, "REPLACE", 1L),
      (2L, "a", 0.2, "REPLACE", 2L),
      (3L, "b", 1.5, "REPLACE", 3L),
      (1L, "b", 0.7, "REPLACE", 4L),  // key 1 moves group a→b
      (2L, "a", 0.2, "DELETE", 5L),   // group a now empty
      (4L, "c", 2.25, "REPLACE", 6L), // new group
      (3L, "b", 1.25, "REPLACE", 7L)) // in-place update within b
      .toDF("k", "g", "v", Changelog.OpCol, Changelog.SeqCol)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1),
        r.getDecimal(2).stripTrailingZeros)).toSet
    val full = canon(Changelog.aggregate(
      Changelog.materialize(ch, Seq("k")), Seq("g"), Seq("v")))
    assert(full.map(_._1) === Set("b", "c")) // group a really vanished
    for (split <- 1L to 6L) {
      val oldState = Changelog.materialize(
        ch.where(col(Changelog.SeqCol) <= split), Seq("k"))
      val merged = Changelog.mergeAggregate(
        Changelog.aggregate(oldState, Seq("g"), Seq("v")), oldState,
        ch.where(col(Changelog.SeqCol) > split), Seq("k"), Seq("g"), Seq("v"))
      assert(canon(merged) === full, s"split=$split")
      // the base-state lookup must be a broadcast semi join — the 100 TB
      // state table is never shuffled for a micro-batch delta
      val plan = merged.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
        s"state lookup not a broadcast semi join at split=$split")
    }
  }

  test("mergeIndex equals the recomputed index; index table never shuffles") {
    import spark.implicits._
    val ch = Seq(
      (1L, "x", "REPLACE", 1L),
      (2L, "x", "REPLACE", 2L),
      (3L, "y", "REPLACE", 3L),
      (1L, "y", "REPLACE", 4L),  // key 1 moves x→y
      (2L, "x", "DELETE", 5L),   // key 2 leaves the index
      (4L, "z", "REPLACE", 6L))  // new key
      .toDF("k", "v", Changelog.OpCol, Changelog.SeqCol)
    def recompute(upTo: Long) = Changelog.index(
      Changelog.materialize(ch.where(col(Changelog.SeqCol) <= upTo), Seq("k")),
      Seq("k"), Seq("v"))
    for (split <- 1L to 5L) {
      val merged = Changelog.mergeIndex(recompute(split),
        ch.where(col(Changelog.SeqCol) > split), Seq("k"), Seq("v"))
      assert(merged.as[(String, Long)].collect().toSet ===
        recompute(6L).as[(String, Long)].collect().toSet, s"split=$split")
      val plan = merged.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
        s"index maintenance must anti-join broadcast at split=$split")
    }
  }

  test("diff classifies insert/update/delete and drops unchanged rows") {
    import spark.implicits._
    val oldS = Seq(
      ("a", "v1", 1.0),                    // unchanged → absent from the diff
      ("b", "v2", 2.0),                    // payload change → UPDATE (new image)
      ("c", "v3", 3.0),                    // only in old → DELETE (old image)
      ("d", null.asInstanceOf[String], 4.0)) // null → value change → UPDATE
      .toDF("k", "v", "x")
    val newS = Seq(
      ("a", "v1", 1.0),
      ("b", "v2b", 2.0),
      ("d", "v4", 4.0),
      ("e", "v5", 5.0))                    // only in new → INSERT
      .toDF("k", "v", "x")
    val out = Changelog.diff(oldS, newS, Seq("k")).orderBy("k")
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getString(3))).toSeq
    assert(out === Seq(
      ("b", "v2b", 2.0, "UPDATE"),
      ("c", "v3", 3.0, "DELETE"),
      ("d", "v4", 4.0, "UPDATE"),
      ("e", "v5", 5.0, "INSERT")))
  }

  test("diff round-trips: old state + diff-as-changelog rebuilds the new state") {
    import spark.implicits._
    val oldS = Seq(("a", "v1"), ("b", "v2"), ("c", "v3")).toDF("k", "v")
    val newS = Seq(("a", "v1x"), ("c", "v3"), ("d", "v4")).toDF("k", "v")
    val asChangelog = Changelog.fromSnapshot(oldS, lit(0L)).unionByName(
      Changelog.diff(oldS, newS, Seq("k"))
        .withColumn(Changelog.SeqCol, lit(1L))
        .withColumn(Changelog.OpCol,
          when(col(Changelog.OpCol) === "DELETE", "DELETE").otherwise("REPLACE")))
    val rebuilt = Changelog.materialize(asChangelog, Seq("k"))
      .as[(String, String)].collect().toSet
    assert(rebuilt === newS.as[(String, String)].collect().toSet)
  }

  test("softDelete flags deletes instead of removing state") {
    val events = ValuesSource.singleSplitSingleTable
    val tid = TableId.of("default_namespace", "default_schema", "table1")
    val schema = CdcSchema.of("col1" -> "STRING", "col2" -> "STRING").copy(primaryKeys = Seq("col1"))
    val dataEvents = events.collect { case e: DataChangeEvent => e }
    val out = Changelog.materialize(
      Changelog.softDelete(ValuesSource.toChangelog(spark, schema, dataEvents)), Seq("col1"))
      .orderBy("col1").collect()
    assert(out.length === 3) // key 3 survives with __deleted = true
    assert(out.map(r => (r.getString(0), r.getAs[Boolean]("__deleted"))).toSeq ===
      Seq(("1", false), ("2", false), ("3", true)))
  }
}

class ValuesDatabaseSpec extends SparkSpec {
  test("schema evolution mutates stored rows positionally") {
    val t = TableId.of("db", "t")
    val db = new ValuesDatabase
    db.apply(CreateTableEvent(t, CdcSchema.of("id" -> "INT", "name" -> "STRING").copy(primaryKeys = Seq("id"))))
    db.apply(DataChangeEvent.insert(t, Seq(1, "a")))
    db.apply(AddColumnEvent(t, "age", IntegerType, ColumnPosition.After("id")))
    assert(db.results(t) === Seq(Seq(1, null, "a")))
    db.apply(DataChangeEvent.insert(t, Seq(2, 20, "b")))
    db.apply(DropColumnEvent(t, "age"))
    assert(db.results(t) === Seq(Seq(1, "a"), Seq(2, "b")))
    db.apply(TruncateTableEvent(t))
    assert(db.results(t).isEmpty)
  }
}
