"""spark-submit entry point for the streaming embedding ingest.

    spark-submit --py-files dist/ml4logs_spark.zip \
      jobs/run_embedding_ingest.py --input <dir-of-parquet-batches> \
      --state <state_dir> --checkpoint <ckpt_dir>

Drains the source with an availableNow trigger (the batch-job-over-a-
stream shape): each micro-batch probes the persisted band + int8-code
state for near-duplicates against all prior history and extends the
state — rerunning the job resumes from the checkpoint and the
per-batch commit markers make retries idempotent.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="directory of parquet embedding batches (glob ok)")
    ap.add_argument("--state", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--threshold", type=float, default=0.4)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--cores", default=None)
    args = ap.parse_args()

    from ml4logs_spark.session import get_spark
    from ml4logs_spark.streaming import embedding_ingest as ei

    spark = get_spark(app_name="ml4logs_embedding_ingest", cores=args.cores)
    t0 = time.perf_counter()
    q = ei.run_embedding_ingest(
        ei.stream_embeddings(spark, args.input),
        state_dir=args.state,
        checkpoint_dir=args.checkpoint,
        threshold=args.threshold,
        dim=args.dim,
    )
    q.awaitTermination()
    wall = time.perf_counter() - t0
    pairs_dir = Path(args.state) / "pairs"
    n_pairs = (
        spark.read.parquet(str(pairs_dir)).count() if pairs_dir.exists() else 0
    )
    codes_dir = Path(args.state) / "codes"
    n_state = (
        spark.read.parquet(str(codes_dir)).count() if codes_dir.exists() else 0
    )
    print(json.dumps({
        "wall_sec": round(wall, 3),
        "state_vectors": n_state,
        "near_dup_pairs": n_pairs,
    }))


if __name__ == "__main__":
    main()
