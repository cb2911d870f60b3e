#!/usr/bin/env python3
"""Independent mirror of the tar fixture path: re-read the .tar files
dumped by TarSpec (target/tar-fixtures/seed*.tar + .txt goldens) with
Python's stdlib `tarfile` — zero shared code with graft.ops.Tar — and
compare member paths + contents against the golden. tarfile validates
header checksums and ustar framing itself, so agreement proves the
Scala writer emits spec-conforming archives and the reader's member
walk matches a reference implementation.

Run after `sbt "testOnly graft.TarSpec"`:
    python3 tools/check_tar_fixture.py
"""
import io
import sys
import tarfile
from pathlib import Path


def tar_text(raw: bytes) -> str:
    out = []
    with tarfile.open(fileobj=io.BytesIO(raw), mode="r:") as tf:
        for m in tf.getmembers():
            if m.isreg():
                out.append(m.name + " " +
                           tf.extractfile(m).read().decode("utf-8"))
    return "\n".join(out)


def main():
    fixdir = Path("target/tar-fixtures")
    files = sorted(fixdir.glob("seed*.tar"), key=lambda f: int(f.stem[4:]))
    if not files:
        print("no fixtures — run `sbt 'testOnly graft.TarSpec'` first",
              file=sys.stderr)
        return 1
    bad = 0
    for f in files:
        golden = f.with_suffix(".txt").read_text(encoding="utf-8")
        got = tar_text(f.read_bytes())
        if got != golden:
            bad += 1
            print(f"MISMATCH {f.name}:\n  got    {got!r}\n  golden {golden!r}")
        else:
            print(f"OK {f.name}")
    print(f"{len(files) - bad}/{len(files)} agree")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
