# Airflow deployment face of the first-5-innings result job.
#
# The reference runs this as its OWN DAG, apart from the daily chain:
# dags/070_get_game_resulty.py:141-152 — dag_id
# '070_scrape_game_result_until_5_innings', schedule '50 14 * * *'
# (a single PythonOperator that scrapes the per-inning scoreboard and
# upserts game_records_until_5_innings). Mirrored here as a standalone
# one-task DAG on the same cadence: the scrape boundary lands the
# `scoreboard` table (per-inning run arrays — in the fixture smoke,
# Stage000LandTables derives it deterministically), and the task runs
# graft.jobs.stages.Stage070FiveInnings, which slices innings 1..5 and
# lands the signed result via the same Metrics.fiveInningResult path
# that q_m070_five_inning hash-adjudicates against DuckDB.
#
# Executed in CI by tools/run_dag_smoke.py alongside the daily-chain
# DAG; graft.jobs.ChainCheck adjudicates the landed output against the
# in-process transform.

import os
from datetime import datetime, timedelta

from airflow import DAG
from airflow.providers.apache.spark.operators.spark_submit import (
    SparkSubmitOperator,
)

GRAFT_JAR = os.environ.get("GRAFT_JAR", "/opt/graft/graft-assembly.jar")
GRAFT_LAKE = os.environ.get("GRAFT_LAKE", "s3a://graft/lake")

default_args = {
    "owner": "graft",
    "retries": 2,
    "retry_delay": timedelta(minutes=5),
}

with DAG(
    dag_id="graft_five_innings",
    description="First-5-innings game result (reference DAG 070) on Spark",
    schedule="50 14 * * *",  # reference 070's own cadence (KST pinned)
    start_date=datetime(2024, 3, 1),
    catchup=False,
    default_args=default_args,
) as dag:
    SparkSubmitOperator(
        task_id="s070_five_innings",
        application=GRAFT_JAR,
        java_class="graft.jobs.stages.Stage070FiveInnings",
        application_args=[GRAFT_LAKE],
        conf={
            "spark.sql.adaptive.enabled": "true",
            "spark.sql.session.timeZone": "UTC",
            "spark.sql.extensions": "graft.GraftExtensions",
        },
    )
