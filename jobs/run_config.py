"""Config-driven entry point — the reference's UX
(``python -m ml4logs <config.json>``) on the Spark engine:

    spark-submit --py-files dist/ml4logs_spark.zip \
      jobs/run_config.py configs/transcripts_preprocess.json
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    if len(sys.argv) != 2:
        raise SystemExit("usage: python jobs/run_config.py <config.json>")

    from ml4logs_spark.plans.config_runner import run_config
    from ml4logs_spark.session import get_spark

    spark = get_spark(app_name="ml4logs_config")
    result = run_config(spark, sys.argv[1])
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
