package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.{QueryDef, Tables}

/** Verbatim TPC-DS queries over a derived star-schema fixture (VERDICT
  * r14 task #1). BASELINE.md's second graded benchmark is TPC-DS
  * (reference results `benchmarks/results/0.16.0/comet-tpcds.json`, 103
  * queries; suite pattern
  * `spark/src/test/scala/org/apache/spark/sql/CometTPCDSQuerySuite.scala`);
  * until now it was represented only by archetypes (q212–q215,
  * q227/q228). Here five queries run with their REFERENCE TEXT
  * (`benchmarks/tpc/queries/tpcds/q{3,7,34,42,73}.sql`) — Q3, Q7, Q34,
  * Q42, Q73 — against a deterministic star derived from the shipped
  * tables, the q118–q122 partsupp precedent taken one step further:
  *
  * **One SQL string, two engines.** Each query is the shared fixture
  * WITH-prefix + the TPC-DS text, written in the common Spark/DuckDB SQL
  * dialect; the Spark side registers the base parquet tables as temp
  * views and runs `spark.sql(text)`, and the SAME string is the oracle.
  * There is no Spark-vs-SQL translation to drift — the comparison tests
  * the ENGINES on identical declarative input.
  *
  * Fixture derivation (deterministic, engine-independent):
  *  - `store_sales`: one row per lineitem line; ticket == order
  *    (customer/store/household demographics are per-ticket — derived
  *    from l_orderkey only — item/promo/customer-demographics vary per
  *    line), sold-date from o_orderdate so a ticket is one calendar day,
  *    like the real fact. All money columns are QUARTER-DOLLAR doubles
  *    (k * 0.25): every value, product with the int quantity, and
  *    600k-term sum is an exact binary fraction, so sum/avg are
  *    bit-identical across engines and summation orders — the money
  *    convention adapted to verbatim `avg(...)`/`sum(...)` text that
  *    cannot insert cents casts.
  *  - `date_dim`: distinct o_orderdate days, d_date_sk = yyyymmdd int.
  *  - `item`/`customer`: modulus projections of part/customer.
  *  - `customer_demographics` (70 rows), `household_demographics`
  *    (300 rows), `store` (10), `promotion` (300): VALUES cross
  *    products carrying the REAL TPC-DS domain values ('4 yr Degree',
  *    '501-1000', 'Williamson County', channel 'N'/'Y' flags), so the
  *    queries' predicates run verbatim.
  *
  * Deviations from the reference text (each the established substitution
  * policy of TpchQueries/TpchPartsuppQueries, documented per query):
  *  - Q34: `cnt between 15 and 20` → `between 5 and 10` (tickets are
  *    TPC-H orders with ≤13 lines at sf0.01; the original band is empty
  *    at every shipped SF).
  *  - Q42: the unaliased `sum(ss_ext_sales_price)` gets an alias
  *    (`sum_sales`) — auto-generated column names differ per engine and
  *    the driver compares by column name.
  *  - Q73: `ss_ticket_number` appended to ORDER BY — the reference
  *    order `(cnt DESC, c_last_name)` is not total (one customer with
  *    two same-size tickets ties), and a non-total presentation order
  *    makes the result hash engine-arbitrary (the r10 lesson pinned in
  *    OrderTotalitySuite).
  *  - Q7's `d_year = 2001`, Q42's `1998`, Q34/Q73's year triples all
  *    fall inside the fixture's 1995–2001 calendar and run UNCHANGED,
  *    as do Q3's `i_manufact_id = 445` and `d_moy = 12`.
  *
  * Scale posture (100 TB): store_sales is the fact — its derivation is
  * one lineitem⋈orders hash join on the already-co-partitioned orderkey
  * (in a real deployment store_sales is a stored table and this join
  * disappears). Every dimension (item 20k rows, date_dim ~2.5k,
  * demographics ≤300, store 10, promotion 300, customer 15k at sf0.1)
  * broadcasts; the grouped aggregates shuffle only group keys + partial
  * buffers. No cartesian, no driver-side state.
  */
object TpcdsStarQueries {

  /** Shared star-schema derivation, dialect-common SQL (parses in both
    * Spark SQL and DuckDB): year/month/day, concat, CAST AS STRING/INT,
    * nonneg %, VALUES-in-FROM with column aliases, e-notation double
    * literals (0.25e0 — a bare 0.25 is a DECIMAL literal in both
    * dialects and would poison the money columns' types). */
  private val fixture: String = """
store_sales AS (
  SELECT
    year(o_orderdate) * 10000 + month(o_orderdate) * 100 + day(o_orderdate) AS ss_sold_date_sk,
    l_partkey AS ss_item_sk,
    o_custkey AS ss_customer_sk,
    (l_orderkey * 7 + l_linenumber) % 70 AS ss_cdemo_sk,
    l_orderkey % 300 AS ss_hdemo_sk,
    l_orderkey % 10 AS ss_store_sk,
    (l_partkey + l_orderkey) % 300 AS ss_promo_sk,
    l_orderkey AS ss_ticket_number,
    CAST(l_quantity AS INT) AS ss_quantity,
    ((l_partkey * 13 + l_linenumber * 7) % 400 + 40) * 0.25e0 AS ss_list_price,
    ((l_orderkey * 5 + l_linenumber * 11) % 40) * 0.25e0 AS ss_coupon_amt,
    (((l_partkey * 13 + l_linenumber * 7) % 400 + 40)
      - ((l_orderkey * 5 + l_linenumber * 11) % 40)) * 0.25e0 AS ss_sales_price,
    (((l_partkey * 13 + l_linenumber * 7) % 400 + 40)
      - ((l_orderkey * 5 + l_linenumber * 11) % 40)) * 0.25e0
      * CAST(l_quantity AS INT) AS ss_ext_sales_price,
    ((((l_partkey * 13 + l_linenumber * 7) % 400 + 40)
      - ((l_orderkey * 5 + l_linenumber * 11) % 40))
      - ((l_partkey * 17 + l_linenumber * 3) % 360 + 20)) * 0.25e0
      * CAST(l_quantity AS INT) AS ss_net_profit
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
date_dim AS (
  SELECT DISTINCT
    year(o_orderdate) * 10000 + month(o_orderdate) * 100 + day(o_orderdate) AS d_date_sk,
    year(o_orderdate) AS d_year, month(o_orderdate) AS d_moy, day(o_orderdate) AS d_dom
  FROM orders),
item AS (
  SELECT p_partkey AS i_item_sk,
    concat('ITEM_', CAST(p_partkey % 1000 AS STRING)) AS i_item_id,
    CAST(p_partkey % 12 + 1 AS INT) AS i_brand_id,
    concat('Brand_', CAST(p_partkey % 12 + 1 AS STRING)) AS i_brand,
    CAST(p_partkey % 7 + 1 AS INT) AS i_category_id,
    concat('Category_', CAST(p_partkey % 7 + 1 AS STRING)) AS i_category,
    CAST(p_partkey % 500 + 1 AS INT) AS i_manufact_id,
    CAST(p_partkey % 100 + 1 AS INT) AS i_manager_id
  FROM part),
customer_demographics AS (
  SELECT g.gi * 35 + m.mi * 7 + e.ei AS cd_demo_sk,
    g.gv AS cd_gender, m.mv AS cd_marital_status, e.ev AS cd_education_status
  FROM (VALUES (0, 'M'), (1, 'F')) AS g(gi, gv)
  CROSS JOIN (VALUES (0, 'M'), (1, 'S'), (2, 'D'), (3, 'W'), (4, 'U')) AS m(mi, mv)
  CROSS JOIN (VALUES (0, 'Primary'), (1, 'Secondary'), (2, 'College'), (3, '2 yr Degree'),
    (4, '4 yr Degree'), (5, 'Advanced Degree'), (6, 'Unknown')) AS e(ei, ev)),
household_demographics AS (
  SELECT b.bi * 50 + d.dv * 5 + v.vv AS hd_demo_sk,
    b.bv AS hd_buy_potential, d.dv AS hd_dep_count, v.vv AS hd_vehicle_count
  FROM (VALUES (0, 'Unknown'), (1, '0-500'), (2, '501-1000'), (3, '1001-5000'),
    (4, '5001-10000'), (5, '>10000')) AS b(bi, bv)
  CROSS JOIN (VALUES (0), (1), (2), (3), (4), (5), (6), (7), (8), (9)) AS d(dv)
  CROSS JOIN (VALUES (0), (1), (2), (3), (4)) AS v(vv)),
store AS (
  SELECT sv.si AS s_store_sk,
    CASE WHEN sv.si % 3 = 0 THEN 'Williamson County'
      ELSE concat('County_', CAST(sv.si % 3 AS STRING)) END AS s_county
  FROM (VALUES (0), (1), (2), (3), (4), (5), (6), (7), (8), (9)) AS sv(si)),
promotion AS (
  SELECT pa.pi * 30 + pb.qi AS p_promo_sk,
    CASE WHEN (pa.pi * 30 + pb.qi) % 2 = 0 THEN 'N' ELSE 'Y' END AS p_channel_email,
    CASE WHEN (pa.pi * 30 + pb.qi) % 3 = 0 THEN 'N' ELSE 'Y' END AS p_channel_event
  FROM (VALUES (0), (1), (2), (3), (4), (5), (6), (7), (8), (9)) AS pa(pi)
  CROSS JOIN (VALUES (0), (1), (2), (3), (4), (5), (6), (7), (8), (9), (10), (11), (12),
    (13), (14), (15), (16), (17), (18), (19), (20), (21), (22), (23), (24), (25), (26),
    (27), (28), (29)) AS pb(qi)),
customer_base AS (SELECT c_custkey, c_name FROM customer),
customer_ds AS (
  SELECT c_custkey AS c_customer_sk, c_name AS c_last_name,
    concat('FN_', CAST(c_custkey % 97 AS STRING)) AS c_first_name,
    CASE CAST(c_custkey % 4 AS INT) WHEN 0 THEN 'Mr.' WHEN 1 THEN 'Ms.'
      WHEN 2 THEN 'Dr.' ELSE 'Mx.' END AS c_salutation,
    CASE WHEN c_custkey % 2 = 0 THEN 'Y' ELSE 'N' END AS c_preferred_cust_flag
  FROM customer_base)
"""

  /** One shared-text query: register the base tables as temp views, run
    * the identical string Spark-side; the string IS the oracle. */
  private def sharedSql(name: String, body: String, doc: String): QueryDef = {
    val text = "WITH " + fixture + body
    QueryDef(
      name,
      (s: SparkSession, dir: String) => {
        Seq("lineitem", "orders", "part", "customer")
          .foreach(t => Tables.t(s, dir, t).createOrReplaceTempView(t))
        s.sql(text)
      },
      Some(text),
      doc = doc)
  }

  def all: Seq[QueryDef] = Seq(

    sharedSql("q229_tpcds_q3", """
select  dt.d_year
       ,item.i_brand_id brand_id
       ,item.i_brand brand
       ,sum(ss_net_profit) sum_agg
 from  date_dim dt
      ,store_sales
      ,item
 where dt.d_date_sk = store_sales.ss_sold_date_sk
   and store_sales.ss_item_sk = item.i_item_sk
   and item.i_manufact_id = 445
   and dt.d_moy=12
 group by dt.d_year
      ,item.i_brand
      ,item.i_brand_id
 order by dt.d_year
         ,sum_agg desc
         ,brand_id
  LIMIT 100""",
      doc = "TPC-DS Q3 verbatim (benchmarks/tpc/queries/tpcds/q3.sql) over the derived star: brand-level December net profit for one manufacturer. i_manufact_id=445 and d_moy=12 unchanged. Dims broadcast; exact quarter-dollar double sums."),

    sharedSql("q230_tpcds_q7", """
select  i_item_id,
        avg(ss_quantity) agg1,
        avg(ss_list_price) agg2,
        avg(ss_coupon_amt) agg3,
        avg(ss_sales_price) agg4
 from store_sales, customer_demographics, date_dim, item, promotion
 where ss_sold_date_sk = d_date_sk and
       ss_item_sk = i_item_sk and
       ss_cdemo_sk = cd_demo_sk and
       ss_promo_sk = p_promo_sk and
       cd_gender = 'M' and
       cd_marital_status = 'M' and
       cd_education_status = '4 yr Degree' and
       (p_channel_email = 'N' or p_channel_event = 'N') and
       d_year = 2001
 group by i_item_id
 order by i_item_id
  LIMIT 100""",
      doc = "TPC-DS Q7 verbatim (q7.sql): demographic-sliced item averages over four money columns. All five predicates (gender/marital/education/promo channels/d_year=2001) unchanged — the fixture dims carry the real TPC-DS domain values. avg over exact binary fractions is engine- and order-independent."),

    sharedSql("q231_tpcds_q34", """
select c_last_name
       ,c_first_name
       ,c_salutation
       ,c_preferred_cust_flag
       ,ss_ticket_number
       ,cnt from
   (select ss_ticket_number
          ,ss_customer_sk
          ,count(*) cnt
    from store_sales,date_dim,store,household_demographics
    where store_sales.ss_sold_date_sk = date_dim.d_date_sk
    and store_sales.ss_store_sk = store.s_store_sk
    and store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk
    and (date_dim.d_dom between 1 and 3 or date_dim.d_dom between 25 and 28)
    and (household_demographics.hd_buy_potential = '501-1000' or
         household_demographics.hd_buy_potential = 'Unknown')
    and household_demographics.hd_vehicle_count > 0
    and (case when household_demographics.hd_vehicle_count > 0
	then household_demographics.hd_dep_count/ household_demographics.hd_vehicle_count
	else null
	end)  > 1.2
    and date_dim.d_year in (2000,2000+1,2000+2)
    and store.s_county in ('Williamson County','Williamson County','Williamson County','Williamson County',
                           'Williamson County','Williamson County','Williamson County','Williamson County')
    group by ss_ticket_number,ss_customer_sk) dn,customer_ds
    where ss_customer_sk = c_customer_sk
      and cnt between 5 and 10
    order by c_last_name,c_first_name,c_salutation,c_preferred_cust_flag desc, ss_ticket_number""",
      doc = "TPC-DS Q34 (q34.sql): month-edge bulk shoppers per household profile. Deviations: cnt band 15..20 -> 5..10 (tickets are TPC-H orders, <=13 lines), customer -> customer_ds (the derived dimension's CTE name; base TPC-H customer keeps its name). Williamson County, buy-potential bands, dep/vehicle ratio all verbatim."),

    sharedSql("q232_tpcds_q42", """
select  dt.d_year
 	,item.i_category_id
 	,item.i_category
 	,sum(ss_ext_sales_price) sum_sales
 from 	date_dim dt
 	,store_sales
 	,item
 where dt.d_date_sk = store_sales.ss_sold_date_sk
 	and store_sales.ss_item_sk = item.i_item_sk
 	and item.i_manager_id = 1
 	and dt.d_moy=11
 	and dt.d_year=1998
 group by 	dt.d_year
 		,item.i_category_id
 		,item.i_category
 order by       sum_sales desc,dt.d_year
 		,item.i_category_id
 		,item.i_category
 LIMIT 100""",
      doc = "TPC-DS Q42 (q42.sql): category revenue for one manager's items in November 1998 — i_manager_id=1, d_moy=11, d_year=1998 all verbatim. Single deviation: the unaliased sum gets AS sum_sales (auto-generated column names differ per engine; the driver compares by name)."),

    sharedSql("q233_tpcds_q73", """
select c_last_name
       ,c_first_name
       ,c_salutation
       ,c_preferred_cust_flag
       ,ss_ticket_number
       ,cnt from
   (select ss_ticket_number
          ,ss_customer_sk
          ,count(*) cnt
    from store_sales,date_dim,store,household_demographics
    where store_sales.ss_sold_date_sk = date_dim.d_date_sk
    and store_sales.ss_store_sk = store.s_store_sk
    and store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk
    and date_dim.d_dom between 1 and 2
    and (household_demographics.hd_buy_potential = '1001-5000' or
         household_demographics.hd_buy_potential = '5001-10000')
    and household_demographics.hd_vehicle_count > 0
    and case when household_demographics.hd_vehicle_count > 0 then
             household_demographics.hd_dep_count/ household_demographics.hd_vehicle_count else null end > 1
    and date_dim.d_year in (1999,1999+1,1999+2)
    and store.s_county in ('Williamson County','Williamson County','Williamson County','Williamson County')
    group by ss_ticket_number,ss_customer_sk) dj,customer_ds
    where ss_customer_sk = c_customer_sk
      and cnt between 1 and 5
    order by cnt desc, c_last_name asc, ss_ticket_number""",
      doc = "TPC-DS Q73 (q73.sql): small-basket month-start shoppers. Deviations: customer -> customer_ds (derived dimension CTE), and ss_ticket_number appended to ORDER BY — the reference (cnt DESC, c_last_name) order is not total and a tied order makes the hash engine-arbitrary. cnt 1..5, both hd bands, years 1999..2001 verbatim.")
  )
}
