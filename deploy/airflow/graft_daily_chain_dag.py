# Airflow deployment face of the graft daily chain.
#
# Mirrors the reference pipeline's DAG wiring (zjacom/airflow-baseball):
# the reference chains DAGs with TriggerDagRunOperator
# (dags/000_scrape_games_result.py:147-153 triggers 001;
# dags/001_park_factor_calculation.py:106-113 triggers 010; ... through
# dags/060_insert_pitcher_integration_data.py). Here the same chain is
# ONE DAG of spark-submit tasks over the per-stage mains in
# graft.jobs.stages — each stage reads/writes reference-shaped parquet
# tables in $GRAFT_LAKE, so Airflow owns scheduling and retries while
# every transformation stays in the Spark library (and is identical to
# the in-process jobs.DailyChain composition, see StagesSpec).
#
# Stage 000 is the scrape boundary: in production, replace the
# Stage000LandTables task with the scraper jobs that land the same
# table shapes (game_records, hitters, pitchers, today_lineup, the
# opponent/stadium/game splits); everything downstream is unchanged.
#
# Executed in CI by tools/run_dag_smoke.py (no Airflow scheduler in
# the test environment): the smoke runs THIS file under a minimal
# operator shim, pins the `>>` wiring against the reference chain,
# launches each task's main over the sf0.001 fixture in topological
# order, and adjudicates staged == in-process via graft.jobs.ChainCheck
# (the same equality graft.jobs.StagesSpec proves in-JVM).

import os
from datetime import datetime, timedelta

from airflow import DAG
from airflow.providers.apache.spark.operators.spark_submit import (
    SparkSubmitOperator,
)

GRAFT_JAR = os.environ.get("GRAFT_JAR", "/opt/graft/graft-assembly.jar")
GRAFT_LAKE = os.environ.get("GRAFT_LAKE", "s3a://graft/lake")
GRAFT_RAW = os.environ.get("GRAFT_RAW", "s3a://graft/raw")

default_args = {
    "owner": "graft",
    "retries": 2,
    "retry_delay": timedelta(minutes=5),
}


def stage(task_id: str, main_class: str, args: list) -> SparkSubmitOperator:
    return SparkSubmitOperator(
        task_id=task_id,
        application=GRAFT_JAR,
        java_class=main_class,
        application_args=args,
        conf={
            # the engine's cluster posture: AQE re-plans skew/size at
            # runtime; shuffle partitions sized by the cluster, not 200
            "spark.sql.adaptive.enabled": "true",
            "spark.sql.session.timeZone": "UTC",
            "spark.sql.extensions": "graft.GraftExtensions",
        },
    )


with DAG(
    dag_id="graft_daily_chain",
    description="KBO daily metric chain (reference DAGs 000-060) on Spark",
    schedule="0 1 * * *",  # reference: daily post-game run (KST pinned)
    start_date=datetime(2024, 3, 1),
    catchup=False,
    default_args=default_args,
) as dag:
    land = stage("s000_land_tables",
                 "graft.jobs.stages.Stage000LandTables",
                 [GRAFT_RAW, GRAFT_LAKE])
    park = stage("s001_park_factor",
                 "graft.jobs.stages.Stage001ParkFactor", [GRAFT_LAKE])
    woba = stage("s011_hitter_woba",
                 "graft.jobs.stages.Stage011HitterWoba", [GRAFT_LAKE])
    wrc = stage("s012_hitter_wrc",
                "graft.jobs.stages.Stage012HitterWrc", [GRAFT_LAKE])
    rates = stage("s013_hitter_rates",
                  "graft.jobs.stages.Stage013HitterRates", [GRAFT_LAKE])
    pitcher = stage("s021_pitcher_metrics",
                    "graft.jobs.stages.Stage021PitcherMetrics", [GRAFT_LAKE])
    hmetrics = stage("s041_hitter_metrics",
                     "graft.jobs.stages.Stage041HitterMetrics", [GRAFT_LAKE])
    hrecords = stage("s050_hitter_records",
                     "graft.jobs.stages.Stage050HitterRecords", [GRAFT_LAKE])
    precords = stage("s060_pitcher_records",
                     "graft.jobs.stages.Stage060PitcherRecords", [GRAFT_LAKE])

    # reference chain: 000 -> 001 -> (hitter stages) -> 041 -> 050/060
    land >> park
    land >> [woba, rates, pitcher]
    woba >> wrc
    [park, wrc, rates] >> hmetrics
    hmetrics >> hrecords
    [pitcher, hmetrics] >> precords
