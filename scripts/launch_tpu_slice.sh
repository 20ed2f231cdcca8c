#!/usr/bin/env bash
# Concrete ALGONAUTS_TPU_LAUNCHER template: run ONE job-array element on its
# own TPU slice via GCP queued resources.
#
# The grid runner (cache/task_cache.py::_launch_external) invokes the
# launcher once per array element with the element's JSON config appended:
#
#   ALGONAUTS_TPU_LAUNCHER="bash scripts/launch_tpu_slice.sh" \
#       python -m algonauts2025_tpu.grids.run_grid      # or run_ensemble
#
# This is the TPU equivalent of the reference's exca Slurm submission
# (reference modeling_utils/utils.py:125-155): each element becomes an
# independent accelerator job with its own logs; skip-if-done, bounded
# parallelism and status aggregation live in _launch_external.
#
# Environment:
#   TPU_PROJECT        GCP project id                        (required)
#   TPU_ZONE           e.g. us-west4-a                       (required)
#   GCS_STAGING        gs:// prefix for configs + wheels     (required)
#   TPU_TYPE           accelerator type (default v5litepod-64 — the
#                      BASELINE.json sweep/ensemble slice)
#   TPU_RUNTIME        TPU VM image (default v2-alpha-tpuv5-lite)
#   TPU_SETUP_CMD      per-worker install command (default: pip install the
#                      sdist staged at $GCS_STAGING/algonauts2025_tpu.tar.gz)
#   TPU_SLICE_DRYRUN=1 print the exact gcloud plan, then run the element
#                      locally instead (used by tests/test_fanout.py)
set -euo pipefail

CONFIG="${*: -1}"
[ -f "$CONFIG" ] || { echo "launch_tpu_slice: config '$CONFIG' not found" >&2; exit 2; }

ELEMENT="$(basename "$CONFIG" .json)"
# queued-resource names must be unique per attempt and RFC-1035-ish
NAME="algonauts-${ELEMENT//_/-}-$(date +%s)-$$"
TPU_TYPE="${TPU_TYPE:-v5litepod-64}"
TPU_RUNTIME="${TPU_RUNTIME:-v2-alpha-tpuv5-lite}"
TPU_SETUP_CMD="${TPU_SETUP_CMD:-pip install -q \"\$GCS_STAGING/algonauts2025_tpu.tar.gz\"}"

if [ "${TPU_SLICE_DRYRUN:-0}" = "1" ]; then
    GCS_STAGING="${GCS_STAGING:-gs://DRYRUN-bucket}"
    TPU_PROJECT="${TPU_PROJECT:-dryrun-project}"
    TPU_ZONE="${TPU_ZONE:-dryrun-zone}"
fi
: "${TPU_PROJECT:?launch_tpu_slice: set TPU_PROJECT}"
: "${TPU_ZONE:?launch_tpu_slice: set TPU_ZONE}"
: "${GCS_STAGING:?launch_tpu_slice: set GCS_STAGING}"

RUN_CMD="gsutil -q cp '$GCS_STAGING/$NAME.json' /tmp/task.json && \
python -m algonauts2025_tpu.grids.run_config /tmp/task.json"

plan() {
    cat >&2 <<EOF
launch_tpu_slice plan for array element $ELEMENT:
  [1] gsutil cp $CONFIG $GCS_STAGING/$NAME.json
  [2] gcloud compute tpus queued-resources create $NAME \\
        --node-id $NAME --project $TPU_PROJECT --zone $TPU_ZONE \\
        --accelerator-type $TPU_TYPE --runtime-version $TPU_RUNTIME
  [3] poll: gcloud compute tpus queued-resources describe $NAME ... until ACTIVE
  [4] gcloud compute tpus tpu-vm ssh $NAME --worker=all \\
        --command='$TPU_SETUP_CMD && $RUN_CMD'
  [5] gcloud compute tpus queued-resources delete $NAME --force --quiet
EOF
}

if [ "${TPU_SLICE_DRYRUN:-0}" = "1" ]; then
    plan
    echo "launch_tpu_slice: DRYRUN — running the element locally" >&2
    exec python -m algonauts2025_tpu.grids.run_config "$CONFIG"
fi

plan

gsutil -q cp "$CONFIG" "$GCS_STAGING/$NAME.json"

gcloud compute tpus queued-resources create "$NAME" \
    --node-id "$NAME" --project "$TPU_PROJECT" --zone "$TPU_ZONE" \
    --accelerator-type "$TPU_TYPE" --runtime-version "$TPU_RUNTIME"

cleanup() {
    gcloud compute tpus queued-resources delete "$NAME" \
        --project "$TPU_PROJECT" --zone "$TPU_ZONE" --force --quiet || true
}
trap cleanup EXIT

# wait for the slice (queued resources can sit in WAITING_FOR_RESOURCES)
while :; do
    STATE=$(gcloud compute tpus queued-resources describe "$NAME" \
        --project "$TPU_PROJECT" --zone "$TPU_ZONE" \
        --format='value(state.state)')
    case "$STATE" in
        ACTIVE) break ;;
        FAILED|SUSPENDED) echo "queued resource $NAME entered $STATE" >&2; exit 1 ;;
        *) sleep 30 ;;
    esac
done

# run the element on every worker of the slice; JAX's TPU pod runtime
# wires process ids/coordinator automatically on TPU VMs
gcloud compute tpus tpu-vm ssh "$NAME" --worker=all \
    --project "$TPU_PROJECT" --zone "$TPU_ZONE" \
    --command="export GCS_STAGING='$GCS_STAGING'; $TPU_SETUP_CMD && $RUN_CMD"
