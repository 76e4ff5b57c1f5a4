"""Bucketed-table layout: the co-located join story made observable.

At 100 TB the fact tables are written bucketed+sorted on the join key so
repeated joins are shuffle-free (SURVEY §1.4 / README scale story); this
test materializes the layout at fixture scale and asserts the plan shape:
the bucketed join has NO shuffle on either side, while the plain-parquet
join exchanges both.
"""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    od = spark.read.parquet(f"{sf_dir}/orders.parquet")
    # DROP TABLE only clears the session-scoped catalog entry; a previous
    # session's warehouse directory would still collide (LOCATION_ALREADY_
    # EXISTS), so clear the locations too
    import shutil

    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS od_b")
    for t in ("li_b", "od_b"):
        shutil.rmtree(f"/tmp/spark_graft_warehouse/{t}", ignore_errors=True)
    (li.write.mode("overwrite").bucketBy(8, "l_orderkey")
       .sortBy("l_orderkey").saveAsTable("li_b"))
    (od.write.mode("overwrite").bucketBy(8, "o_orderkey")
       .sortBy("o_orderkey").saveAsTable("od_b"))
    return li, od


def _n_exchanges(df) -> int:
    return df._jdf.queryExecution().executedPlan().toString().count("Exchange")


def test_bucketed_join_is_shuffle_free(spark, bucketed):
    li, od = bucketed
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    try:
        plain = (
            li.join(od, li.l_orderkey == od.o_orderkey)
            .groupBy("o_orderstatus").count()
        )
        buck = (
            spark.table("li_b").join(
                spark.table("od_b"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            ).groupBy("o_orderstatus").count()
        )
        # plain join shuffles both sides + agg; bucketed join only the agg
        assert _n_exchanges(plain) >= 3
        assert _n_exchanges(buck) == 1
        # same answer either way
        a = {(r.o_orderstatus, r["count"]) for r in plain.collect()}
        b = {(r.o_orderstatus, r["count"]) for r in buck.collect()}
        assert a == b
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
