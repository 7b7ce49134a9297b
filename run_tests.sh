#!/bin/bash
# Full test suite, sharded across fresh processes.
#
# A single long-lived process accumulates XLA:CPU compiler state that can
# segfault deep into the run (see tests/conftest.py); per-module cache
# clearing mitigates it, and sharding makes the suite robust regardless.
set -e
cd "$(dirname "$0")"
ulimit -s unlimited 2>/dev/null || true

SHARD1="tests/test_api_surface.py tests/test_config.py tests/test_utils.py tests/test_fft_alignment.py tests/test_filterbank_goldens.py \
tests/test_io_modules.py tests/test_checkpoint.py tests/test_profiler.py tests/test_loggers.py tests/test_cli.py tests/test_ops.py tests/test_no_nan.py \
tests/test_extract.py tests/test_views.py tests/test_parallel.py tests/test_framed_conv.py"
SHARD2="tests/test_sample_rnn.py tests/test_gen_loop.py tests/test_train_loop.py \
tests/test_demos.py tests/test_ensemble.py tests/test_torch_parity.py tests/test_migrate.py"
SHARD3="tests/test_wavenet.py tests/test_transformers.py tests/test_tied_autoencoder.py tests/test_pallas_decode.py tests/test_pallas_lstm.py tests/test_streaming.py"
SHARD4="tests/test_seq2seq.py tests/test_legacy_nets.py tests/test_precision.py"

# fail loudly if a test file is in no shard (new files must be added above)
for f in tests/test_*.py; do
    case " $SHARD1 $SHARD2 $SHARD3 $SHARD4 " in
        *" $f "*) ;;
        *) echo "ERROR: $f is not in any shard — add it to run_tests.sh"; exit 1 ;;
    esac
done

for shard in "$SHARD1" "$SHARD2" "$SHARD3" "$SHARD4"; do
    echo "=== shard: $shard"
    python -m pytest $shard -q "$@"
done
echo "ALL SHARDS GREEN"
