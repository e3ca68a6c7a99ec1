"""Resume the 100x-scale (sf10) oracle sweep: run any registry queries not
yet recorded in CORRECTNESS_SF10.json in small batches (bounding DuckDB +
Spark peak memory), merging each batch's results into the artifact as it
lands, so an interrupted run resumes where it left off.

Usage: python scripts/resume_sf10.py [--batch N] [--artifact PATH]
    [--sf-dir DIR] [--last name ...]

Defaults target the 100x artifact (CORRECTNESS_SF10.json over
/tmp/sf10); pass --artifact CORRECTNESS_SF1.json --sf-dir /tmp/sf1 to
top up the 10x record the same way.

--last names are deferred to the end and run one-at-a-time (for known
memory-heavy oracles such as quality_lexical).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

DEFAULT_ARTIFACT = "CORRECTNESS_SF10.json"
DEFAULT_SF_DIR = "/tmp/sf10"


def main() -> int:
    argv = sys.argv[1:]
    batch = 8
    artifact = DEFAULT_ARTIFACT
    sf_dir = DEFAULT_SF_DIR
    if "--artifact" in argv:
        i = argv.index("--artifact")
        artifact = argv[i + 1]
        del argv[i : i + 2]
    if "--sf-dir" in argv:
        i = argv.index("--sf-dir")
        sf_dir = argv[i + 1]
        del argv[i : i + 2]
    if "--batch" in argv:
        i = argv.index("--batch")
        batch = int(argv[i + 1])
        del argv[i : i + 2]
    last: list[str] = []
    if "--last" in argv:
        i = argv.index("--last")
        last = argv[i + 1 :]
        del argv[i:]

    sys.path.insert(0, ".")
    from article_extractor_spark.queries import QUERY_FNS

    with open(artifact) as f:
        art = json.load(f)
    done = set(art["queries"])
    remaining = [q for q in QUERY_FNS if q not in done and q not in last]
    deferred = [q for q in last if q not in done]
    print(f"{len(done)} done, {len(remaining)} remaining, {len(deferred)} deferred")

    batches = [remaining[i : i + batch] for i in range(0, len(remaining), batch)]
    batches += [[q] for q in deferred]
    for group in batches:
        out = "/tmp/bigsf_batch.json"
        # the batch file must not survive from a previous (possibly
        # different-scale) run: check_oracles writes it only on
        # success, so a crashed batch would otherwise merge the STALE
        # file's rows into this artifact and mask the crash
        try:
            os.remove(out)
        except FileNotFoundError:
            pass
        cmd = [
            sys.executable,
            "scripts/check_oracles.py",
            "--json",
            out,
            sf_dir,
            *group,
        ]
        print("RUN", group, flush=True)
        rc = subprocess.call(cmd)
        try:
            with open(out) as f:
                got = json.load(f)
        except Exception as exc:  # noqa: BLE001
            print(f"batch produced no artifact ({exc}); rc={rc}", flush=True)
            got = {}
        rows = got.get("queries", got)
        art["queries"].update(rows)
        with open(artifact, "w") as f:
            json.dump(art, f, indent=1)
        bad = [
            k
            for k, v in rows.items()
            if v.get("hash_match") is False or v.get("err")
        ]
        print(
            f"merged {len(rows)} (total {len(art['queries'])}); red: {bad}",
            flush=True,
        )
        if rc != 0 and not rows:
            print("batch crashed with no output; stopping", flush=True)
            return 1
    greens = sum(
        1 for v in art["queries"].values() if v.get("hash_match") or v.get("hash_match") is None and not v.get("err")
    )
    print(f"DONE: {len(art['queries'])} recorded, {greens} green/rows-only")
    return 0


if __name__ == "__main__":
    main()
