package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.Ops

/** The reference's stateless operator catalog exercised as driver-checkable
  * queries (reference: pkg/processing/default_filter_operators.go:11-75 and
  * default_operators.go:61-268), plus TPC-H-style relational queries that
  * are the bench headliners.
  *
  * Scale notes, per query, live on the definitions below. The common theme:
  * every filter/projection here compiles to a single whole-stage-codegen'd
  * scan stage with the predicate pushed into the parquet reader.
  */
object RelationalQueries {

  /** One SQL text, two engines: runs verbatim on Spark (temp views +
    * spark.sql) and as its own DuckDB oracle — the query-language surface
    * the reference explicitly scoped out (README.md:27-31) that Spark
    * provides for free.
    */
  private val PortableRevenueSql =
    """SELECT o_orderstatus, o_orderpriority,
      floor(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) * 100 + 0.5) / 100 AS revenue,
      count(*) AS n
      FROM orders GROUP BY o_orderstatus, o_orderpriority"""

  def defs: Map[String, QueryDef] = Map(
    // Join-key skew audit — the diagnostic a pipeline runs BEFORE a big
    // keyed join decides between plain shuffle, AQE skew-split, and
    // manual salting (Joins.saltedJoin): per-key share of the table for
    // the top keys plus the uniform-share baseline. One
    // combiner-friendly count + a 20-row TakeOrdered to the driver —
    // the audit itself is never the bottleneck. A key with share >>
    // 1/shufflePartitions is the salting trigger.
    "q_skew_report" -> QueryDef(
      (s, dir) => {
        val li = Tables.load(s, dir, "lineitem")
        val total = li.agg(count(lit(1)).as("t"))
        li.groupBy(col("l_suppkey").as("key"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("key").asc)
          .limit(20)
          .crossJoin(broadcast(total))
          .select(col("key"), col("n"),
            Det.r4(col("n").cast("double") / col("t")).as("share"))
      },
      Some(s"""WITH tot AS (SELECT count(*) AS t FROM lineitem)
        SELECT l_suppkey AS key, count(*) AS n,
          ${Det.sqlR4("CAST(count(*) AS DOUBLE) / (SELECT t FROM tot)")} AS share
        FROM lineitem GROUP BY 1
        ORDER BY n DESC, key ASC LIMIT 20""")),

    // Z-order (Morton) layout audit — the write-side data organization
    // that makes MULTI-column min/max pruning work: interleave the bits
    // of two join/filter keys, bucket rows by the code's top bits, and
    // report each bucket's per-column bounds. The payoff is visible in
    // the output: every bucket covers a tight RECTANGLE in (orderkey,
    // partkey) space, so a scan filtered on EITHER column can skip most
    // buckets on file-level statistics — linear layout by one column
    // gives tight bounds on that column only. Bit arithmetic is
    // generated from one Scala loop for BOTH engines (identical terms;
    // max bit 31 so ANSI-safe), one combiner-friendly aggregation.
    "q_zorder" -> QueryDef(
      (s, dir) => {
        // the write side of this audit is operators.Layout.writeZOrdered
        // (same Morton interleave; LayoutSpec pins the produced files'
        // rectangle tightness)
        Tables.load(s, dir, "lineitem")
          .select((col("l_orderkey") % 65536).as("ok"),
            (col("l_partkey") % 65536).as("pk"))
          .withColumn("zbucket", shiftright(
            graft.operators.Layout.morton(col("ok"), col("pk"), 16), 26))
          .groupBy("zbucket")
          .agg(count(lit(1)).as("n"),
            min("ok").as("min_ok"), max("ok").as("max_ok"),
            min("pk").as("min_pk"), max("pk").as("max_pk"))
      },
      Some {
        val mortonSql = (0 until 16).map(i =>
          s"(((ok >> $i) & 1) << ${2 * i}) + (((pk >> $i) & 1) << ${2 * i + 1})")
          .mkString(" + ")
        s"""WITH k AS (SELECT l_orderkey % 65536 AS ok,
            l_partkey % 65536 AS pk FROM lineitem),
          z AS (SELECT ok, pk, ($mortonSql) >> 26 AS zbucket FROM k)
          SELECT zbucket, count(*) AS n,
            min(ok) AS min_ok, max(ok) AS max_ok,
            min(pk) AS min_pk, max(pk) AS max_pk
          FROM z GROUP BY 1"""
      }),

    // Three-key Z-order audit — the N-column generalization
    // (Layout.mortonN: bit i of key k at position i*N + k; 3 keys at 10
    // bits each stay ANSI-safe in a long). Real tables filter on 3+
    // dimensions; the audit shows each z-bucket covers a tight BOX in
    // (orderkey, partkey, price) space, so a point predicate on ANY of
    // the three prunes most buckets — the per-dimension resolution cost
    // of packing three keys into one code is the documented Z-order
    // trade. The third key is truncated extendedprice rather than
    // suppkey: suppkey's cardinality at test SF (~100) leaves its high
    // grid bits constant, which would make the third dimension's bounds
    // vacuous in every bucket (Spark long cast truncates; DuckDB CAST
    // rounds, hence the explicit floor there).
    "q_zorder3" -> QueryDef(
      (s, dir) => {
        Tables.load(s, dir, "lineitem")
          .select((col("l_orderkey") % 1024).as("ok"),
            (col("l_partkey") % 1024).as("pk"),
            (col("l_extendedprice").cast("long") % 1024).as("ep"))
          .withColumn("zbucket", shiftright(
            graft.operators.Layout.mortonN(
              Seq(col("ok"), col("pk"), col("ep")), 10), 24))
          .groupBy("zbucket")
          .agg(count(lit(1)).as("n"),
            min("ok").as("min_ok"), max("ok").as("max_ok"),
            min("pk").as("min_pk"), max("pk").as("max_pk"),
            min("ep").as("min_ep"), max("ep").as("max_ep"))
      },
      Some {
        val mortonSql = (for {
          i <- 0 until 10
          (c, k) <- Seq("ok", "pk", "ep").zipWithIndex
        } yield s"((($c >> $i) & 1) << ${3 * i + k})").mkString(" + ")
        s"""WITH k AS (SELECT l_orderkey % 1024 AS ok,
            l_partkey % 1024 AS pk,
            CAST(floor(l_extendedprice) AS BIGINT) % 1024 AS ep
          FROM lineitem),
          z AS (SELECT ok, pk, ep, ($mortonSql) >> 24 AS zbucket FROM k)
          SELECT zbucket, count(*) AS n,
            min(ok) AS min_ok, max(ok) AS max_ok,
            min(pk) AS min_pk, max(pk) AS max_pk,
            min(ep) AS min_ep, max(ep) AS max_ep
          FROM z GROUP BY 1"""
      }),

    "q_sql_surface" -> QueryDef(
      (s, dir) => {
        Tables.load(s, dir, "orders").createOrReplaceTempView("orders")
        s.sql(PortableRevenueSql)
      },
      Some(PortableRevenueSql)),

    // --- filter family (reference: default_filter_operators.go) --------

    // Greater (reference :23-28): pushed to parquet scan as value > 100.
    "q_filter_greater" -> QueryDef(
      (s, dir) => Ops.greater(col("value"), 100.0)(
        Tables.load(s, dir, "events")).select("event_id", "user_id", "value"),
      Some("SELECT event_id, user_id, value FROM events WHERE value > 100")),

    // Smaller (reference :31-36).
    "q_filter_smaller" -> QueryDef(
      (s, dir) => Ops.smaller(col("value"), 10.0)(
        Tables.load(s, dir, "events")).select("event_id", "value"),
      Some("SELECT event_id, value FROM events WHERE value < 10")),

    // Even (reference :39-44): truncate-then-parity, pinned by
    // default_operators_test.go:117-143. Spark's double->long cast
    // truncates toward zero; DuckDB CAST rounds, hence trunc() there.
    "q_filter_even" -> QueryDef(
      (s, dir) => Ops.even(col("value"))(
        Tables.load(s, dir, "events")).select("event_id", "value"),
      Some("SELECT event_id, value FROM events " +
        "WHERE CAST(trunc(value) AS BIGINT) % 2 = 0")),

    // Odd (reference :47-52).
    "q_filter_odd" -> QueryDef(
      (s, dir) => Ops.odd(col("value"))(
        Tables.load(s, dir, "events")).select("event_id", "value"),
      Some("SELECT event_id, value FROM events " +
        "WHERE CAST(trunc(value) AS BIGINT) % 2 <> 0")),

    // Contains (reference :70-75): substring filter on strings.
    "q_filter_contains" -> QueryDef(
      (s, dir) => Ops.containsOp(col("text"), "vector")(
        Tables.load(s, dir, "documents")).select("doc_id", "source"),
      Some("SELECT doc_id, source FROM documents " +
        "WHERE contains(text, 'vector')")),

    // Limit (reference :55-67): the reference's unsynchronized counter is
    // "approximately first n"; we pin an explicit order for determinism.
    "q_limit" -> QueryDef(
      (s, dir) => Ops.limitOp(100, col("event_id"))(
        Tables.load(s, dir, "events")).select("event_id", "value"),
      Some("SELECT event_id, value FROM events ORDER BY event_id LIMIT 100")),

    // --- map family (reference: default_operators.go) ------------------

    // Map (reference :104-113) as a column-level 1:1 transform. The
    // product is double IEEE math — bitwise identical on both engines —
    // so no decimal detour is needed for a per-row value.
    "q_map_project" -> QueryDef(
      (s, dir) => Ops.mapOp(
        col("l_orderkey"), col("l_linenumber"),
        Det.r2(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("net_price"))(Tables.load(s, dir, "lineitem")),
      Some("SELECT l_orderkey, l_linenumber, " +
        "floor(l_extendedprice * (1.0 - l_discount) * 100 + 0.5) / 100 AS net_price " +
        "FROM lineitem")),

    // Convert (reference :61-76): numeric cast, truncation semantics.
    "q_convert" -> QueryDef(
      (s, dir) => Ops.convert(col("value"), "long", "value_int")(
        Tables.load(s, dir, "events")).select("event_id", "value_int"),
      Some("SELECT event_id, CAST(trunc(value) AS BIGINT) AS value_int " +
        "FROM events")),

    // SelectFromMap (reference :81-101): project one key out of a dynamic
    // payload; missing key -> NULL (default_operators_test.go:339-362).
    // The events.props column is a JSON document = the reference's
    // map[string]any event.
    "q_select_from_map" -> QueryDef(
      (s, dir) => Ops.selectFromJson(col("props"), "k", "k")(
        Tables.load(s, dir, "events")).select("event_id", "k"),
      Some("SELECT event_id, json_extract_string(props, '$.k') AS k " +
        "FROM events")),

    // Composed operator pipeline — the builder's ConnectTo chain in batch
    // form: filter -> project-from-map -> windowed aggregate, one
    // codegen'd scan stage feeding one shuffle.
    "q_pipeline_composite" -> QueryDef(
      (s, dir) => {
        val chain: Ops.Op =
          Ops.greater(col("value"), 20.0) andThen
            Ops.selectFromJson(col("props"), "k", "k") andThen
            (df => df.groupBy(
              window(col("ts"), "3600 seconds"), col("event_type"))
              .agg(count(lit(1)).as("n"),
                Det.r2(sum(col("value").cast("decimal(18,2)")).cast("double"))
                  .as("sum_value"),
                count(col("k")).as("n_with_k"))
              .select(col("window.start").cast("long").as("ws"),
                col("event_type"), col("n"), col("sum_value"),
                col("n_with_k")))
        chain(Tables.load(s, dir, "events"))
      },
      Some("""SELECT CAST(floor(epoch(ts)/3600)*3600 AS BIGINT) AS ws,
        event_type, count(*) AS n,
        floor(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) * 100 + 0.5) / 100 AS sum_value,
        count(json_extract_string(props, '$.k')) AS n_with_k
        FROM events WHERE value > 20
        GROUP BY 1, 2"""),
      bench = true),

    // --- TPC-H-style heavy hitters (bench headliners) -------------------

    // Pricing summary (TPC-H Q1 shape): one scan, map-side partial agg,
    // 32-partition shuffle of ~8 groups. Money sums go through
    // DECIMAL(18,4) so the sum is exact and order-independent.
    "q1_pricing" -> QueryDef(
      (s, dir) => Tables.load(s, dir, "lineitem")
        // the canonical Q1 shipdate cutoff; also the query's pushdown
        // surface — PlanSpec pins that it reaches the parquet scan
        .where(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          Det.r2(sum(col("l_quantity").cast("decimal(18,2)")).cast("double"))
            .as("sum_qty"),
          Det.r2(sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double"))
            .as("sum_base"),
          // Per-row products are quantized with the deterministic floor
          // form BEFORE the decimal cast: double->decimal rounding itself
          // differs between engines (Spark goes through the shortest
          // decimal string, DuckDB rounds the binary value).
          Det.r2(sum(Det.r4(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("decimal(18,4)")).cast("double")).as("sum_disc"),
          Det.r2(sum(Det.r4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            * (lit(1.0) + col("l_tax"))).cast("decimal(18,4)")).cast("double"))
            .as("sum_charge"),
          count(lit(1)).as("n_rows")),
      Some("""SELECT l_returnflag, l_linestatus,
        floor(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) * 100 + 0.5) / 100 AS sum_qty,
        floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) * 100 + 0.5) / 100 AS sum_base,
        floor(CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 10000 + 0.5) / 10000 AS DECIMAL(18,4))) AS DOUBLE) * 100 + 0.5) / 100 AS sum_disc,
        floor(CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) * 10000 + 0.5) / 10000 AS DECIMAL(18,4))) AS DOUBLE) * 100 + 0.5) / 100 AS sum_charge,
        count(*) AS n_rows
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus"""),
      bench = true),

    // Revenue by nation/region: 3-way join where nation and region are
    // broadcast (they are tiny at every SF — 25 and 5 rows), so the only
    // shuffle is the final 25-group aggregation. At 100 TB the
    // customer->orders join would co-partition on custkey; AQE handles
    // skew.
    "q_revenue_nation" -> QueryDef(
      (s, dir) => {
        val customer = Tables.load(s, dir, "customer")
        val orders = Tables.load(s, dir, "orders")
        val nation = Tables.load(s, dir, "nation")
        val region = Tables.load(s, dir, "region")
        orders.join(customer, orders("o_custkey") === customer("c_custkey"))
          .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
          .groupBy("r_name", "n_name")
          .agg(
            Det.r2(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double"))
              .as("revenue"),
            count(lit(1)).as("n_orders"))
      },
      Some("""SELECT r_name, n_name,
        floor(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) * 100 + 0.5) / 100 AS revenue,
        count(*) AS n_orders
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name"""),
      bench = true),

    // Brand volume: fact-to-dim join; part is broadcastable at every SF
    // we run (200 rows/SF-unit scales to ~20k at sf100 — still tiny).
    "q_brand_volume" -> QueryDef(
      (s, dir) => Tables.load(s, dir, "lineitem")
        .join(broadcast(Tables.load(s, dir, "part")),
          col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(
          Det.r2(sum(col("l_quantity").cast("decimal(18,2)")).cast("double"))
            .as("sum_qty"),
          count(lit(1)).as("n_items")),
      Some("""SELECT p_brand,
        floor(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) * 100 + 0.5) / 100 AS sum_qty,
        count(*) AS n_items
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand"""),
      bench = true),

    // Semi join: customers having at least one big order (reference has
    // no set/semi operators — SURVEY §2.2 exhaustiveness note; free in
    // Spark as LEFT SEMI, which shuffles only keys from the right side).
    "q_semi_join" -> QueryDef(
      (s, dir) => Tables.load(s, dir, "customer")
        .join(Tables.load(s, dir, "orders")
          .where(col("o_totalprice") > 400000),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name"),
      Some("""SELECT c_custkey, c_name FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)""")),

    // Anti join: customers with no orders at all.
    "q_anti_join" -> QueryDef(
      (s, dir) => Tables.load(s, dir, "customer")
        .join(Tables.load(s, dir, "orders"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name"),
      Some("""SELECT c_custkey, c_name FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey)""")),

    // Set ops: INTERSECT / EXCEPT over key sets.
    "q_set_ops" -> QueryDef(
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val en = docs.where(col("lang") === "en").select("doc_id")
        val long = docs.where(col("n_chars") > 200).select("doc_id")
        en.intersect(long).withColumn("op", lit("en_and_long"))
          .unionByName(en.except(long).withColumn("op", lit("en_only")))
      },
      Some("""SELECT doc_id, 'en_and_long' AS op FROM (
          SELECT doc_id FROM documents WHERE lang = 'en'
          INTERSECT
          SELECT doc_id FROM documents WHERE n_chars > 200) a
        UNION ALL
        SELECT doc_id, 'en_only' AS op FROM (
          SELECT doc_id FROM documents WHERE lang = 'en'
          EXCEPT
          SELECT doc_id FROM documents WHERE n_chars > 200) b""")),

    // Order-priority histogram per status (grouped count — the simplest
    // shuffle-once aggregate).
    "q_order_priority" -> QueryDef(
      (s, dir) => Tables.load(s, dir, "orders")
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n")),
      Some("SELECT o_orderstatus, o_orderpriority, count(*) AS n " +
        "FROM orders GROUP BY o_orderstatus, o_orderpriority")),

    // Top customers by spend: join + agg + deterministic top-k
    // (rank by value with key tiebreak so the cut is stable).
    "q_top_customers" -> QueryDef(
      (s, dir) => {
        val orders = Tables.load(s, dir, "orders")
        val customer = Tables.load(s, dir, "customer")
        orders.groupBy("o_custkey")
          .agg(Det.r2(sum(col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")).as("spend"))
          .join(customer, col("o_custkey") === col("c_custkey"))
          .select(col("c_custkey"), col("c_name"), col("spend"))
          .orderBy(col("spend").desc, col("c_custkey"))
          .limit(10)
      },
      Some("""SELECT c_custkey, c_name, spend FROM (
          SELECT o_custkey,
            floor(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) * 100 + 0.5) / 100 AS spend
          FROM orders GROUP BY o_custkey) t
        JOIN customer ON o_custkey = c_custkey
        ORDER BY spend DESC, c_custkey LIMIT 10""")))
}
