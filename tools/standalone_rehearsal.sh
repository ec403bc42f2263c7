#!/usr/bin/env bash
# Standalone-cluster submit rehearsal: prove the spark-submit path the
# session factory claims to support (session.py:_resolve_master) by
# actually executing a linkage rung through a real master/worker fleet
# instead of the in-process local[N] backend.
#
# Mirrors the reference's own deployment shape — it stands up a
# standalone master + workers inside its SLURM allocation
# (spark_slurm_container/start_spark_master.py:1-51,
# start_spark_workers.py) — re-expressed as the stock Spark 4 sbin
# scripts + our conf/spark-cluster.conf template, with the fleet-shape
# keys overridden down to what one box can host (2 workers x 16 cores).
#
# Usage: tools/standalone_rehearsal.sh [sf_dir] [scale_mult] [mode]
#   defaults: /root/testdata/sf0.1  8  cascade
# Prints the job's ONE JSON line (cascade_wall ...) on stdout; all
# daemon/submit noise goes to $REHEARSAL_DIR/*.log.

set -euo pipefail

SF_DIR="${1:-/root/testdata/sf0.1}"
MULT="${2:-8}"
MODE="${3:-cascade}"

# fleet sizing knobs (defaults = the r6 rehearsal shape). Bigger ladder
# rungs need bigger executors the same way bench_linkage sizes the local
# heap with the data: e.g. 128x wants WORKER_MEM=40g EXEC_MEM=18g (the
# in-process rung used 64g for 32 concurrent tasks; 4 x 18g gives the
# same ~2g/task with headroom for overhead).
WORKER_CORES="${WORKER_CORES:-16}"
WORKER_MEM="${WORKER_MEM:-24g}"
EXEC_CORES="${EXEC_CORES:-8}"
EXEC_MEM="${EXEC_MEM:-10g}"
MAX_EXECUTORS="${MAX_EXECUTORS:-4}"

REPO="$(cd "$(dirname "$0")/.." && pwd)"
export SPARK_HOME="${SPARK_HOME:-/opt/spark}"
REHEARSAL_DIR="${REHEARSAL_DIR:-/tmp/spark-standalone-rehearsal}"
export SPARK_LOG_DIR="$REHEARSAL_DIR/logs"
export SPARK_PID_DIR="$REHEARSAL_DIR/pids"
export SPARK_WORKER_DIR="$REHEARSAL_DIR/work"
export SPARK_LOCAL_IP=127.0.0.1
export SPARK_MASTER_HOST=127.0.0.1
# NOTE: do NOT set SPARK_NO_DAEMONIZE (even empty) — spark-daemon.sh
# tests whether it is set at all, and a foreground master blocks here
# executors fork python workers for the pandas-UDF stages; pin the same
# interpreter the driver runs so pickles round-trip
export PYSPARK_PYTHON="${PYSPARK_PYTHON:-$(command -v python)}"
export PYSPARK_DRIVER_PYTHON="$PYSPARK_PYTHON"

MASTER_URL="spark://127.0.0.1:7077"
mkdir -p "$SPARK_LOG_DIR" "$SPARK_PID_DIR" "$SPARK_WORKER_DIR" "$REHEARSAL_DIR/dist"

cleanup() {
  "$SPARK_HOME/sbin/stop-worker.sh" >/dev/null 2>&1 || true
  # two worker instances: stop-worker.sh only stops instance 1
  SPARK_WORKER_INSTANCE=2 "$SPARK_HOME/sbin/spark-daemon.sh" stop \
    org.apache.spark.deploy.worker.Worker 2 >/dev/null 2>&1 || true
  "$SPARK_HOME/sbin/stop-master.sh" >/dev/null 2>&1 || true
}
trap cleanup EXIT

# ---- package zip for --py-files (executors import the engine from it)
(cd "$REPO" && python - <<'EOF'
import zipfile, pathlib
root = pathlib.Path("person_linkage_case_study_spark")
with zipfile.ZipFile("/tmp/spark-standalone-rehearsal/dist/engine.zip", "w") as z:
    for p in sorted(root.rglob("*.py")):
        z.write(p, p.as_posix())
    jar = root / "jvm" / "sparklinkage.jar"
    if jar.exists():
        z.write(jar, jar.as_posix())
EOF
)

# ---- fleet: 1 master + 2 workers (16 cores / 24g each = the local[32]
# budget split across real executor JVMs with real shuffle fetches)
"$SPARK_HOME/sbin/start-master.sh" --host 127.0.0.1 --port 7077 \
  --webui-port 8080 >"$REHEARSAL_DIR/master-start.log" 2>&1
for i in 1 2; do
  SPARK_WORKER_INSTANCE=$i "$SPARK_HOME/sbin/spark-daemon.sh" start \
    org.apache.spark.deploy.worker.Worker $i \
    --host 127.0.0.1 --port $((7078 + i)) --webui-port $((8081 + i)) \
    --cores "$WORKER_CORES" --memory "$WORKER_MEM" "$MASTER_URL" \
    >"$REHEARSAL_DIR/worker-$i-start.log" 2>&1
done

# wait for both workers to register
for _ in $(seq 1 30); do
  REGISTERED=$(cat "$SPARK_LOG_DIR"/*master*.out 2>/dev/null | grep -c "Registering worker" || true)
  [ "${REGISTERED:-0}" -ge 2 ] && break
  sleep 1
done

# ---- submit THROUGH the 100TB template; only the fleet-shape keys are
# overridden to fit one box (every override is a sizing knob, not a
# semantics change — the template's shuffle/AQE/decommission/Arrow
# posture runs as written)
JAR="$REPO/person_linkage_case_study_spark/jvm/sparklinkage.jar"
JARS_ARG=""
[ -f "$JAR" ] && JARS_ARG="--jars $JAR"

# SUBMIT_SCRIPT overrides the submitted app (r9): any bench tool can run
# through the same fleet, with ALL positional args passed verbatim (the
# SF_DIR/MULT/MODE convention is bench_linkage's). Example:
#   SUBMIT_SCRIPT=tools/bench_semdedup.py tools/standalone_rehearsal.sh 10 0.9 64 bucket
if [ -n "${SUBMIT_SCRIPT:-}" ]; then
  APP="$REPO/$SUBMIT_SCRIPT"
  APP_ARGS=("$@")
else
  APP="$REPO/tools/bench_linkage.py"
  APP_ARGS=("$SF_DIR" "$MULT" "$MODE" "${@:4}")
fi

"$SPARK_HOME/bin/spark-submit" \
  --master "$MASTER_URL" \
  --deploy-mode client \
  --properties-file "$REPO/conf/spark-cluster.conf" \
  --driver-memory 8g \
  --conf spark.executor.cores="$EXEC_CORES" \
  --conf spark.executor.memory="$EXEC_MEM" \
  --conf spark.executor.pyspark.memory=0 \
  --conf spark.dynamicAllocation.minExecutors=2 \
  --conf spark.dynamicAllocation.maxExecutors="$MAX_EXECUTORS" \
  --conf spark.sql.shuffle.partitions=64 \
  --conf spark.ui.enabled=false \
  $JARS_ARG \
  --py-files "$REHEARSAL_DIR/dist/engine.zip" \
  "$APP" "${APP_ARGS[@]}" \
  2>"$REHEARSAL_DIR/submit.log"
