# Airflow deployment face of the reference's t-minus-15-minute lineup
# trigger (zjacom/airflow-baseball,
# dags/031_schedule_dag_for_get_today_line_up.py:19-57): after the
# today_games schedule lands (reference 030), enumerate today's
# upcoming games and pre-schedule one lineup-scrape DAG run per game at
# game_time - 15 min, deduplicated by a deterministic run_id (the
# reference dedups via DagRun.find on the execution date).
#
# Split exactly on the engine/orchestrator boundary:
#  - the EVENT-TIME math (which games are upcoming, each one's trigger
#    time) is the Spark stage graft.jobs.stages.Stage031LineupTriggers,
#    built on graft.streaming.EventPipeline.dueWithin — `now` is a
#    templated argument, never the wall clock, so re-runs are
#    deterministic and the stage is oracle-testable;
#  - the SCHEDULING side effect (create a future-dated DAG run) is the
#    thin PythonOperator below, one trigger_dag call per landed row —
#    the only part that needs Airflow state, and the only part the
#    reference wrote in Python too.
#
# Executed in CI by tools/run_dag_smoke.py (no Airflow scheduler in the
# test environment): the smoke parses THIS file under the operator
# shim, runs the Spark stage over a fixture lake at a pinned `now`, and
# drives the trigger callable with a recording stub in place of
# Airflow's trigger_dag — asserting one dedup'd trigger per due game at
# game_time - 15 min.

import os
from datetime import datetime, timedelta

from airflow import DAG
from airflow.operators.python import PythonOperator
from airflow.providers.apache.spark.operators.spark_submit import (
    SparkSubmitOperator,
)

GRAFT_JAR = os.environ.get("GRAFT_JAR", "/opt/graft/graft-assembly.jar")
GRAFT_LAKE = os.environ.get("GRAFT_LAKE", "s3a://graft/lake")
# templated in production ({{ data_interval_end }}); pinned by the smoke
GRAFT_NOW = os.environ.get("GRAFT_NOW", "{{ ts }}")
LEAD_MINUTES = int(os.environ.get("GRAFT_LEAD_MINUTES", "15"))
HORIZON_MINUTES = int(os.environ.get("GRAFT_HORIZON_MINUTES", "1440"))
LINEUP_DAG_ID = "graft_lineup_scrape"

default_args = {
    "owner": "graft",
    "retries": 2,
    "retry_delay": timedelta(minutes=5),
}


def schedule_lineup_runs(lake=None, trigger=None, find_existing=None):
    """Schedule one lineup-scrape run per row of the landed
    lineup_triggers table (run_id, trigger_time per upcoming game).

    `trigger`/`find_existing` default to Airflow's trigger_dag /
    DagRun.find and are injectable so the DAG smoke can drive this
    callable without an Airflow metadata DB.
    """
    import pyarrow.dataset as ds

    lake = lake or GRAFT_LAKE
    if trigger is None or find_existing is None:  # production wiring
        from airflow.api.common.trigger_dag import trigger_dag
        from airflow.models import DagRun

        trigger = trigger or (
            lambda dag_id, run_id, execution_date: trigger_dag(
                dag_id=dag_id, run_id=run_id,
                execution_date=execution_date,
                replace_microseconds=False))
        find_existing = find_existing or (
            lambda dag_id, run_id: DagRun.find(
                dag_id=dag_id, run_id=run_id))

    scheduled = 0
    for row in ds.dataset(f"{lake}/lineup_triggers").to_table().to_pylist():
        if find_existing(LINEUP_DAG_ID, row["run_id"]):
            continue  # already scheduled: the reference's DagRun.find dedup
        trigger(LINEUP_DAG_ID, row["run_id"], row["trigger_time"])
        scheduled += 1
    return scheduled


with DAG(
    dag_id="graft_lineup_trigger",
    description="Pre-schedule lineup scrapes at game_time - 15 min "
                "(reference DAG 031)",
    schedule=None,  # triggered after today_games lands (reference 030)
    start_date=datetime(2024, 3, 1),
    catchup=False,
    default_args=default_args,
) as dag:
    due = SparkSubmitOperator(
        task_id="s031_due_games",
        application=GRAFT_JAR,
        java_class="graft.jobs.stages.Stage031LineupTriggers",
        application_args=[GRAFT_LAKE, GRAFT_NOW, str(LEAD_MINUTES),
                          str(HORIZON_MINUTES)],
        conf={
            "spark.sql.adaptive.enabled": "true",
            "spark.sql.session.timeZone": "UTC",
            "spark.sql.extensions": "graft.GraftExtensions",
        },
    )
    schedule = PythonOperator(
        task_id="s031_schedule_lineup",
        python_callable=schedule_lineup_runs,
    )
    due >> schedule
