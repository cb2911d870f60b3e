#!/usr/bin/env python3
"""Independent mirror of the .msg fixture path: re-parse the .msg files
dumped by MsgSpec (target/msg-fixtures/seed*.msg + .txt goldens) with
the from-scratch Python CFB reader and direct MAPI property-stream
lookups — zero shared code with graft.ops.{Cfb,Msg} — and compare
subject/sender/body against the golden. Agreement checks the
property-stream naming, the Unicode (001F) vs ANSI (001E) store split,
and CRLF normalization.

Run after `sbt "testOnly graft.MsgSpec"`:
    python3 tools/check_msg_fixture.py
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))
from check_doc_fixture import cfb_streams  # noqa: E402


def prop(streams, tag):
    uni = streams.get(f"__substg1.0_{tag}001F")
    if uni is not None:
        return uni.decode("utf-16-le")
    ansi = streams.get(f"__substg1.0_{tag}001E")
    if ansi is not None:
        return ansi.decode("cp1252")
    return ""


def msg_text(raw: bytes) -> str:
    streams = cfb_streams(raw)
    subject = prop(streams, "0037")
    sender = prop(streams, "0C1F")
    body = prop(streams, "1000").replace("\r\n", "\n")
    return subject + " " + sender + " " + body


def main():
    fixdir = Path("target/msg-fixtures")
    files = sorted(fixdir.glob("seed*.msg"), key=lambda f: int(f.stem[4:]))
    if not files:
        print("no fixtures — run `sbt 'testOnly graft.MsgSpec'` first",
              file=sys.stderr)
        return 1
    bad = 0
    for f in files:
        golden = f.with_suffix(".txt").read_text(encoding="utf-8")
        got = msg_text(f.read_bytes())
        if got != golden:
            bad += 1
            print(f"MISMATCH {f.name}:\n  got    {got!r}\n  golden {golden!r}")
        else:
            print(f"OK {f.name}")
    print(f"{len(files) - bad}/{len(files)} agree")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
