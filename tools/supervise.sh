#!/bin/bash
# Training supervisor: restart train.py when the stall watchdog aborts.
#
# The trainer's watchdog (stall_abort_s config key, runners/trainer.py)
# exits with code 17 when no training step completes inside the window —
# the signature of a lost device RPC wedging the host. Training
# checkpoints every check_every steps and auto-resumes, so a restart
# loses at most one checkpoint interval. Any other exit code (success,
# real crash, Ctrl-C) ends the loop.
#
# Usage: tools/supervise.sh --config-file config_files/<cfg>.ini [args...]
#        (pass stall_abort_s via the config or a KEY=VALUE override,
#         e.g. stall_abort_s=1800)
set -u
# When the queue kills our process group (tpu_queue.py timeout path),
# both we and the trainer receive the signal; never restart after one.
trap 'exit 143' TERM INT
while true; do
  python train.py "$@"
  code=$?
  case "$code" in
    17)  echo "supervise: watchdog abort (17) — restarting from last checkpoint" >&2 ;;
    137) echo "supervise: SIGKILLed (137, likely host OOM) — restarting from last checkpoint" >&2 ;;
    *)   exit "$code" ;;
  esac
done
