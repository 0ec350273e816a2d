#!/usr/bin/env python3
"""Record the CPU oracle's full-sequence outputs for a bench dataset.

Runs the oracle once on the WHOLE sequence (not the bench's CPU prefix)
and stores a labels checksum plus the track-identity summary next to the
dataset; bench.py then asserts the measured full-sequence TPU run matches
bit-for-bit.  Usage:

    python tools/record_oracle_full.py [num_frames]
"""
import hashlib
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402


def main():
    num_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    data_dir = bench._dataset(num_frames)
    total, labels, tracker = bench.run_cpu_reference(data_dir, num_frames)
    rec = {
        "num_frames": num_frames,
        "labels_sha256": hashlib.sha256(
            np.ascontiguousarray(labels.astype(np.int32))).hexdigest(),
        "num_points": int(len(labels)),
        "num_clusters": int(len(np.unique(labels[labels >= 0]))),
        "objects": [[r["object_id"], r["object_type"]]
                    for r in sorted(tracker.summary(),
                                    key=lambda r: r["object_id"])],
        "oracle_seconds": round(total, 1),
    }
    out_dir = bench.RECORDS_DIR / data_dir.name
    out_dir.mkdir(parents=True, exist_ok=True)
    out = out_dir / f"oracle_f{num_frames}.json"
    out.write_text(json.dumps(rec))
    print(f"wrote {out} ({rec['num_clusters']} clusters, "
          f"{len(rec['objects'])} objects, {total:.1f}s)")


if __name__ == "__main__":
    main()
