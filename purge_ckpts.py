"""Garbage-collect rotated checkpoints in a training directory.

Each Saver index (`<prefix>checkpoints`, a JSON file with a `latest` rotation list and
the `current` pointer — see segan_pytorch_tpu/utils/checkpoint.py:Saver) may reference
several `weights_<name>` payloads.  This tool shrinks every index in the directory down
to its single newest entry, unlinking the superseded payload files, and rewrites the
index accordingly.  Index semantics follow the reference tool (ref purge_ckpts.py:7-29):
the newest element of `latest` is kept, and `current` is never deleted.
"""
import argparse
import json
from pathlib import Path


def payload_path(ckpt_dir: Path, entry: str) -> Path:
    return ckpt_dir / f"weights_{entry}"


def purge_index(index_file: Path, dry_run: bool = False) -> int:
    """Shrink one Saver index to its newest entry; returns #files removed."""
    ckpt_dir = index_file.parent
    index = json.loads(index_file.read_text())
    rotation = index.get("latest", [])
    if not rotation:
        print(f"  {index_file.name}: empty rotation, nothing to do")
        return 0
    missing = [e for e in rotation if not payload_path(ckpt_dir, e).exists()]
    if missing:
        raise FileNotFoundError(
            f"{index_file.name} references missing payloads: {missing}")
    newest = rotation[-1]
    current = index.get("current")
    doomed = [e for e in rotation[:-1] if e != current]
    for entry in doomed:
        target = payload_path(ckpt_dir, entry)
        if dry_run:
            print(f"  would remove {target}")
        else:
            target.unlink()
            print(f"  removed {target}")
    print(f"  kept {payload_path(ckpt_dir, newest)}")
    if not dry_run:
        index["latest"] = [newest]
        index_file.write_text(json.dumps(index, indent=2))
    return len(doomed)


def main() -> None:
    ap = argparse.ArgumentParser(
        description="Delete all but the newest+current checkpoint of every "
                    "Saver index found in CKPT_DIR.")
    ap.add_argument("ckpt_dir", type=Path)
    ap.add_argument("--dry_run", action="store_true",
                    help="report what would be deleted without touching anything")
    opts = ap.parse_args()

    indices = sorted(opts.ckpt_dir.glob("*checkpoints*"))
    print(f"Found {len(indices)} checkpoint index(es) in {opts.ckpt_dir}:")
    for idx in indices:
        print(f"- {idx.name}")
    n_removed = 0
    for idx in indices:
        n_removed += purge_index(idx, dry_run=opts.dry_run)
    verb = "would be freed" if opts.dry_run else "freed"
    print(f"Done: {n_removed} payload file(s) {verb}.")


if __name__ == "__main__":
    main()
