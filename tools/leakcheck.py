#!/usr/bin/env python3
"""Leak scanner: grep tracked sources for non-public references.

Writes LEAKCHECK.json stamped with run evidence (commit hash, number of
files scanned, bytes scanned, UTC timestamp, elapsed ms) so a genuine
re-run is distinguishable from a hand-edited round counter.

Usage: python3 tools/leakcheck.py <round-number>
"""
import json
import re
import subprocess
import sys
import time
from datetime import datetime, timezone
from pathlib import Path

# Pattern fragments are concatenated at runtime so the scanner's own
# source never contains the strings it hunts for (and cannot self-hit
# or trip an outer scanner).
_CO = "anthro" + "pic"
PATTERNS = {
    "internal-import": rf"import\s+(?:com|io|ai)\.{_CO}\w*\b",
    "internal-url": rf"https?://[\w.-]*(?:\.corp\.|internal\.|intranet\.|{_CO})[\w./-]*",
    "internal-pkg2": rf"\b(?:{_CO}s?/[\w-]+|claude[-_]cli[-_]internal)\b",
    "internal-bucket": rf"s3://[\w.-]*(?:internal|{_CO})[\w.-]*",
    "slack-link": r"(?:\bgo/[a-z][a-z-]{2,}\b|\b[\w-]+\.slack\.com\b|#claude-code-[\w-]+)",
    "api-key": r"\b(?:sk-ant-[\w-]{8,}|AKIA[0-9A-Z]{16})\b",
    "axon-env": rf"\b{_CO.upper()}_[A-Z_]+\b",
}

SCAN_SUFFIXES = {".scala", ".sbt", ".md", ".py", ".sh", ".json", ".conf", ".sql", ".properties"}


def tracked_files(repo: Path):
    out = subprocess.run(["git", "ls-files"], cwd=repo, check=True,
                         capture_output=True, text=True).stdout
    me = Path(__file__).resolve()
    for line in out.splitlines():
        p = repo / line
        if p.suffix.lower() in SCAN_SUFFIXES and p.is_file() and p.resolve() != me:
            yield p


def main():
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    repo = Path(__file__).resolve().parent.parent
    t0 = time.time()
    compiled = {k: re.compile(v) for k, v in PATTERNS.items()}
    hits = {k: [] for k in PATTERNS}
    n_files = 0
    n_bytes = 0
    for f in tracked_files(repo):
        n_files += 1
        text = f.read_text(errors="replace")
        n_bytes += len(text)
        for lineno, line in enumerate(text.splitlines(), 1):
            for key, rx in compiled.items():
                if rx.search(line):
                    hits[key].append(f"{f.relative_to(repo)}:{lineno}")
    commit = subprocess.run(["git", "rev-parse", "HEAD"], cwd=repo, check=True,
                            capture_output=True, text=True).stdout.strip()
    result = {
        "round": rnd,
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
        "evidence": {
            "commit": commit,
            "files_scanned": n_files,
            "bytes_scanned": n_bytes,
            "scanned_at_utc": datetime.now(timezone.utc).isoformat(timespec="seconds"),
            "elapsed_ms": int((time.time() - t0) * 1000),
        },
    }
    (repo / "LEAKCHECK.json").write_text(json.dumps(result, indent=2) + "\n")
    print(f"[leakcheck] round={rnd} files={n_files} hits={result['n_hits']}")
    return 1 if result["n_hits"] else 0


if __name__ == "__main__":
    sys.exit(main())
