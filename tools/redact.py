#!/usr/bin/env python3
"""Scrub raw internal-hostname occurrences from tracked audit artifacts.

The driver's per-round leak scanner quotes git history verbatim, which
re-embeds the one pre-r9 internal hostname (an Artifactory mirror that
appeared in an early SURVEY draft) into the regenerated LEAKCHECK.json.
The standing r9/r16 discipline rewrites every raw occurrence -- full or
GITLOG-truncated fragment -- to the neutral form `artifactory.<redacted>`
so HEAD stays grep-clean.  Run this at round start after the driver
regenerates tracked artifacts:

    python3 tools/redact.py [files...]     # default: LEAKCHECK.json

Matching is STRUCTURAL, not literal: any host fragment following the
generic product prefix is rewritten, and any bare domain-shaped token
whose salted SHA-256 matches a stored digest (the hostname and its
GITLOG-truncation prefixes) is rewritten too -- so no encoding of the
hostname, raw, reversed, or otherwise, appears anywhere in this file.
The replacement text contains no quote/backslash characters, so a pure
text substitution keeps JSON artifacts valid.
"""
import hashlib
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

REDACTED = "artifactory.<redacted>"
REDACTED_HOST = "host.<redacted>"

# Any dotted-host fragment after the generic prefix.  GITLOG lines
# truncate mid-token, so even a single trailing character must match.
# `<` is outside the host-char class, so already-redacted text
# (`artifactory.<redacted>`) is untouched without needing a lookahead.
_PAT = re.compile(r"artifactory\.[\w][\w.-]*")

# Bare-domain pass: every dotted token is salted-hashed and compared
# against the digests of the hostname and each of its >=7-char prefixes
# (GITLOG truncates mid-token).  One-way -- the hostname itself is not
# recoverable from these.
_SALT = "graft-leak-scrub-v2:"
_HOST_DIGESTS = frozenset(
    {
        "0fe0c0fcd80704b6e6b4dd9b8f7299a361e056214b20cb8c553fe28df9c0e1a4",
        "4abdd1ad896ca5c74c576d19ff8280e20b9c40f6003316cce1471238598e3123",
        "55e723ae547624fc2efbe9a367a1263825d1dafccddf521de7e7e56b38e0685e",
        "844400a8f4f3fdc5c1a14b3f163ad60ba4eb90825ac6584df0587069b1a8b0f7",
        "bd51e8077768c8c75a3ad9d90ba0a14c6ebb8f12a3aba1a3a5f742f9223bba2d",
        "db8a06d60686cf8b04dd5f71708b3f59dc1b25ab511b3357502186c9155835ac",
        "dd00075d9c5e71110ba02b14c773a38cbe4c02f898b56cb32f32bc23c79183cd",
    }
)
_TOKEN = re.compile(r"[\w-]+(?:\.[\w-]+)+")


def _is_host(tok: str) -> bool:
    return hashlib.sha256((_SALT + tok).encode()).hexdigest() in _HOST_DIGESTS

DEFAULT_TARGETS = ["LEAKCHECK.json", "VERDICT.md", "ADVICE.md", "SURVEY.md"]


def scrub(path: Path) -> int:
    if not path.exists():
        return 0
    text = path.read_text(encoding="utf-8", errors="surrogateescape")
    scrubbed, n = _PAT.subn(REDACTED, text)
    hits = [0]

    def sub(m: "re.Match[str]") -> str:
        tok = m.group(0)
        if _is_host(tok):
            hits[0] += 1
            return REDACTED_HOST
        return tok

    scrubbed = _TOKEN.sub(sub, scrubbed)
    if n + hits[0]:
        path.write_text(scrubbed, encoding="utf-8", errors="surrogateescape")
    return n + hits[0]


def main(argv):
    targets = argv[1:] or DEFAULT_TARGETS
    total = 0
    for name in targets:
        p = Path(name)
        if not p.is_absolute():
            p = REPO / name
        n = scrub(p)
        total += n
        print(f"{p.name}: {n} occurrence(s) redacted")
    # Verify: nothing raw remains in any scrubbed file.
    for name in targets:
        p = Path(name) if Path(name).is_absolute() else REPO / name
        if not p.exists():
            continue
        text = p.read_text(encoding="utf-8", errors="surrogateescape")
        if _PAT.search(text) or any(
            _is_host(m.group(0)) for m in _TOKEN.finditer(text)
        ):
            print(f"ERROR: raw occurrences remain in {p}", file=sys.stderr)
            return 1
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
