"""Persist trained weights + latest chunk checkpoints into git.

Motivation: round-4 session 2 started on a FRESH host — /tmp and every
gitignored file were gone, which destroyed the epoch-400 chunkY checkpoint
and all 15 trained flagship weight sets.  Result/ xlsx artifacts survived
only because they are force-added to git.  This script makes the weight
layer equally durable: it mirrors final weight .npz files and the LATEST
stacked checkpoint of each in-flight chunk into a git-tracked ``persist/``
directory (save), and copies them back into Result/Weight so resume-from-
latest works after a wipe (restore).

Only the newest checkpoint per ``*.ckpts`` dir is persisted (a T=6 chunk
checkpoint is ~130 MB of params+Adam state; stacking them in git would be
abusive).  Final per-target weights are small (~7.4 MB each).

Usage:
    python scripts/persist_weights.py save      # Result/Weight -> persist/
    python scripts/persist_weights.py restore   # persist/ -> Result/Weight
"""

import os
import shutil
import sys

sys.path.insert(0, ".")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(REPO, "Result", "Weight")
DST = os.path.join(REPO, "persist", "Weight")


def _latest_ckpt(ckdir):
    """Newest checkpoint .npz (+ its .json metadata) in a stacked dir."""
    entries = [f for f in os.listdir(ckdir) if f.endswith(".npz")]
    if not entries:
        return []
    newest = max(entries, key=lambda f: os.path.getmtime(
        os.path.join(ckdir, f)))
    out = [newest]
    meta = newest[:-4] + ".json"
    if os.path.exists(os.path.join(ckdir, meta)):
        out.append(meta)
    return out


def save():
    if not os.path.isdir(SRC):
        print("nothing to persist:", SRC, "missing")
        return 0
    copied = 0
    for root, dirs, files in os.walk(SRC):
        rel = os.path.relpath(root, SRC)
        if root.endswith(".ckpts"):
            keep = set(_latest_ckpt(root))
            dirs[:] = []
            dst = os.path.join(DST, rel)
            # drop superseded checkpoints from the persist mirror
            if os.path.isdir(dst):
                for f in os.listdir(dst):
                    if f not in keep:
                        os.remove(os.path.join(dst, f))
            files = sorted(keep)
        else:
            files = [f for f in files if not f.startswith(".")]
        for f in files:
            s = os.path.join(root, f)
            d = os.path.join(DST, rel, f)
            os.makedirs(os.path.dirname(d), exist_ok=True)
            if (not os.path.exists(d)
                    or os.path.getmtime(s) > os.path.getmtime(d)
                    or os.path.getsize(s) != os.path.getsize(d)):
                shutil.copy2(s, d)
                copied += 1
                print("persisted", os.path.join(rel, f))
    print(f"save done: {copied} files updated under persist/Weight")
    return 0


def restore():
    if not os.path.isdir(DST):
        print("nothing to restore:", DST, "missing")
        return 0
    copied = 0
    for root, _dirs, files in os.walk(DST):
        rel = os.path.relpath(root, DST)
        for f in files:
            s = os.path.join(root, f)
            d = os.path.join(SRC, rel, f)
            if os.path.exists(d):
                continue  # live file wins over the mirror
            os.makedirs(os.path.dirname(d), exist_ok=True)
            shutil.copy2(s, d)
            copied += 1
            print("restored", os.path.join(rel, f))
    print(f"restore done: {copied} files back under Result/Weight")
    return 0


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "save"
    sys.exit({"save": save, "restore": restore}[mode]())
