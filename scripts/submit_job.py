"""spark-submit entry point.

    python -c "from article_extractor_spark.shipping import _build_zip; print(_build_zip())"
    /opt/spark/bin/spark-submit --master local[32] \
        --py-files /tmp/article_extractor_spark-<stamp>.zip \
        scripts/submit_job.py extract --corpus <in> --out <out>

Thin shim: spark-submit needs a script file; all logic lives in
``article_extractor_spark.job.main``.
"""

import sys

from article_extractor_spark.job import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
