#!/usr/bin/env python3
"""Independent mirror of the EML fixture path: re-parse the .eml files
dumped by EmlSpec ('fixture dump' writes target/eml-fixtures/seed*.eml
+ .txt goldens) with Python's stdlib `email` package — zero shared code
with graft.ops.Eml — and compare subject, sender and the extracted
text/plain parts against the golden. Agreement is a real differential
check of header unfolding, RFC 2047 encoded-words, the MIME tree walk
(html twins and attachments must contribute nothing), quoted-printable
soft breaks and base64 under per-part charsets.

Run after `sbt "testOnly graft.EmlSpec"`:
    python3 tools/check_eml_fixture.py
"""
import email
import sys
from email import policy
from pathlib import Path


def extract(raw: bytes):
    msg = email.message_from_bytes(raw, policy=policy.default)
    subject = str(msg["Subject"])
    from_addr = str(msg["From"])
    parts = []
    for p in msg.walk():
        if p.get_content_type() == "text/plain":
            content = p.get_content().replace("\r\n", "\n")
            if content.endswith("\n"):
                content = content[:-1]
            parts.append(content)
    return subject, from_addr, parts


def main():
    fixdir = Path("target/eml-fixtures")
    files = sorted(fixdir.glob("seed*.eml"),
                   key=lambda f: int(f.stem[4:]))
    if not files:
        print("no fixtures found — run `sbt 'testOnly graft.EmlSpec'` first",
              file=sys.stderr)
        return 1
    bad = 0
    for f in files:
        golden = f.with_suffix(".txt").read_text(encoding="utf-8")
        subject, from_addr, parts = extract(f.read_bytes())
        got = subject + " " + from_addr + " " + "\n".join(parts)
        if got != golden:
            bad += 1
            print(f"MISMATCH {f.name}:\n  got    {got!r}\n  golden {golden!r}")
        else:
            print(f"OK {f.name}")
    print(f"{len(files) - bad}/{len(files)} agree")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
