"""A/B the train-pipeline staging: in-process threads vs the
process-staged loader (TRAIN.LOADER_PROCESS, data/shm_loader.py).

Round-4 left the pipeline at 611.6 ms/step vs a ~420 ms max-stage
ideal, attributing the gap to GIL serialization between the assembly
thread and the relay-framing upload thread. This runs the EXACT driver
pipeline bench (bench._bench_train_pipeline: real JPEGs -> ChipLoader
-> staged Prefetchers -> donated step) twice in one process — threads
first, then the shm child process — and prints both, so the shipped
default is a measured choice. Note the box has ONE core: a process
removes GIL contention but cannot add compute; the reference multi-core
layout (worker processes, PrefetchingIter.py:54-70) is what this
enables off-box.

  python scripts/profile_pipeline_process.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main():
    out = {}
    for tag, flag in (("threads", False), ("process", True)):
        print(f"== pipeline bench: {tag} ==", flush=True)
        r = bench._bench_train_pipeline(loader_process=flag)
        out[tag] = r
        print(tag, r, flush=True)
    t = out["threads"]["train_pipeline_ms"]
    p = out["process"]["train_pipeline_ms"]
    out["speedup_process_vs_threads"] = round(t / p, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
