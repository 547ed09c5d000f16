#!/usr/bin/env python3
"""Public-knowledge leak self-scan (ADVICE r4: a bare round-counter bump is
indistinguishable from a stale copy — emit scan metadata with the result).

Greps the tracked tree for anything that would indicate non-public
provenance: private package roots, internal-looking URLs/buckets, chat
permalinks, credential-shaped strings, suspicious env-var prefixes. The
probe classes mirror the driver's LEAKCHECK gate; this is the in-repo
mirror so a regression is caught at commit time, not at judging time.

Usage: python3 tools/leakcheck.py [--write]   (--write updates LEAKCHECK.json)
"""
import json, os, re, subprocess, sys, time

PROBES = {
    "internal-import": r"(?:import|from)\s+(?:com\.anthropic|anthropic\.internal)",
    "internal-url": r"https?://[a-z0-9.-]*\.(?:corp|internal|intranet)\b",
    "internal-pkg2": r"\b(?:claude-cli-internal|anthropics/)",
    "internal-bucket": r"(?:s3|gs)://[a-z0-9-]*(?:internal|private|corp)[a-z0-9-]*",
    "slack-link": r"https?://[a-z0-9-]+\.slack\.com/archives/",
    "api-key": r"\b(?:sk-ant-|AKIA[0-9A-Z]{16}|ghp_[A-Za-z0-9]{36})",
    "axon-env": r"\b[A-Z_]*(?:ANTHROPIC|AXON)_[A-Z_]+\b",
}


def main():
    files = subprocess.run(["git", "ls-files"], capture_output=True,
                           text=True, cwd=os.path.dirname(
                               os.path.dirname(os.path.abspath(__file__)))
                           ).stdout.split()
    hits = {k: [] for k in PROBES}
    n_scanned = 0
    for f in files:
        if f == "tools/leakcheck.py":  # the probe patterns themselves
            continue
        try:
            text = open(f, errors="replace").read()
        except (IsADirectoryError, FileNotFoundError):
            continue
        n_scanned += 1
        for name, pat in PROBES.items():
            for m in re.finditer(pat, text):
                line = text.count("\n", 0, m.start()) + 1
                hits[name].append(f"{f}:{line}:{m.group(0)[:60]}")
    n_hits = sum(len(v) for v in hits.values())
    result = {
        "round": int(sys.argv[sys.argv.index("--round") + 1])
        if "--round" in sys.argv else None,
        "n_hits": n_hits,
        "hits": hits,
        "scan": {
            "files_scanned": n_scanned,
            "probe_classes": len(PROBES),
            "timestamp_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                           time.gmtime()),
            "tool": "tools/leakcheck.py",
        },
    }
    print(json.dumps(result, indent=2))
    if n_hits:
        for k, v in hits.items():
            for h in v:
                print(f"HIT {k}: {h}", file=sys.stderr)
        sys.exit(1)
    if "--write" in sys.argv:
        with open("LEAKCHECK.json", "w") as out:
            json.dump(result, out, indent=2)
            out.write("\n")


if __name__ == "__main__":
    main()
