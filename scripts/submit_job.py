"""spark-submit entry point.

    python -c "from article_extractor_spark.shipping import _build_zip; print(_build_zip())"
    /opt/spark/bin/spark-submit --master local[32] --driver-memory 12g \
        --py-files /tmp/article_extractor_spark-<stamp>.zip \
        scripts/submit_job.py extract --corpus <in> --out <out>

Pass ``--driver-memory`` explicitly: in local mode the heap is fixed
when spark-submit launches the JVM, BEFORE ``build_session``'s
``spark.driver.memory`` conf can apply — the bare invocation runs the
whole cluster-in-a-process on the 1 GiB default (a 2M-doc synth write
OOMed there; the same job passes with 12g).

Thin shim: spark-submit needs a script file; all logic lives in
``article_extractor_spark.job.main``.
"""

import sys

from article_extractor_spark.job import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
