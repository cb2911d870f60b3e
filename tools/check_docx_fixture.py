#!/usr/bin/env python3
"""Independent mirror of the DOCX fixture path: re-parse the .docx files
dumped by DocxSpec ('fixture dump' writes target/docx-fixtures/seed*.docx
+ .txt goldens) with Python's zipfile + ElementTree — zero shared code
with graft.ops.Docx — and compare the extracted text against the golden
logical text. Agreement is a real differential check of the container:
zip layout, run concatenation, xml:space, <w:tab/>/<w:br/> run content
(vs. tab-STOP definitions under w:pPr/w:tabs, which must contribute
nothing), and entity decoding.

Run after `sbt "testOnly graft.DocxSpec"`:
    python3 tools/check_docx_fixture.py
"""
import re
import sys
import zipfile
import io
import xml.etree.ElementTree as ET
from pathlib import Path

W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"


def para_text(p):
    out = []

    def walk(el, in_run):
        tag = el.tag
        if tag == W + "r":
            in_run = True
        if in_run:
            if tag == W + "t":
                out.append(el.text or "")
            elif tag == W + "tab":
                out.append("\t")
            elif tag in (W + "br", W + "cr"):
                out.append("\n")
        for child in el:
            walk(child, in_run)

    walk(p, False)
    return "".join(out)


def extract(data):
    with zipfile.ZipFile(io.BytesIO(data)) as z:
        xml = z.read("word/document.xml")
    root = ET.fromstring(xml)
    return "\n".join(para_text(p) for p in root.iter(W + "p"))


def main():
    fixdir = Path("target/docx-fixtures")
    docs = sorted(fixdir.glob("seed*.docx"),
                  key=lambda p: int(re.findall(r"\d+", p.name)[0]))
    if not docs:
        print("no fixtures — run: sbt 'testOnly graft.DocxSpec'", file=sys.stderr)
        sys.exit(2)
    bad = 0
    for doc in docs:
        golden = doc.with_suffix(".txt").read_text(encoding="utf-8")
        text = extract(doc.read_bytes())
        if text != golden:
            bad += 1
            print(f"{doc.name}: MISMATCH\n  got: {text!r}\n  want: {golden!r}")
        else:
            print(f"{doc.name}: OK")
    print(f"\n{len(docs) - bad}/{len(docs)} fixtures agree")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
