#!/usr/bin/env python3
"""Independent mirror of the PPTX fixture path: re-parse the .pptx files
dumped by PptxSpec ('fixture dump' writes target/pptx-fixtures/seed*.pptx
+ .txt goldens) with Python's zipfile + ElementTree — zero shared code
with graft.ops.Pptx — and compare against the golden logical text.
Checks slide ordering (presentation.xml sldIdLst rels order when the
part is present, numeric part order otherwise), run concatenation,
<a:br/> breaks, entity decoding, and that notesSlide parts contribute
nothing.

Run after `sbt "testOnly graft.PptxSpec"`:
    python3 tools/check_pptx_fixture.py
"""
import re
import sys
import zipfile
import io
import xml.etree.ElementTree as ET
from pathlib import Path

A = "{http://schemas.openxmlformats.org/drawingml/2006/main}"
SLIDE = re.compile(r"ppt/slides/slide(\d+)\.xml$")


def slide_text(xml):
    root = ET.fromstring(xml)
    paras = []
    for p in root.iter(A + "p"):
        buf = []
        for el in p.iter():
            if el.tag == A + "t":
                buf.append(el.text or "")
            elif el.tag == A + "br":
                buf.append("\n")
        paras.append("".join(buf))
    return "\n".join(paras)


R = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
P = "{http://schemas.openxmlformats.org/presentationml/2006/main}"
PKR = "{http://schemas.openxmlformats.org/package/2006/relationships}"


def ordered_names(z):
    names = z.namelist()
    if "ppt/presentation.xml" in names:
        rels = ET.fromstring(z.read("ppt/_rels/presentation.xml.rels"))
        target = {rel.get("Id"): rel.get("Target")
                  for rel in rels.iter(PKR + "Relationship")
                  if rel.get("Type").endswith("/slide")}
        pres = ET.fromstring(z.read("ppt/presentation.xml"))
        return ["ppt/" + target[sld.get(R + "id")]
                for sld in pres.iter(P + "sldId")]
    return [n for _, n in sorted(
        ((int(SLIDE.match(n).group(1)), n) for n in names if SLIDE.match(n)))]


def extract(data):
    with zipfile.ZipFile(io.BytesIO(data)) as z:
        return "\n".join(slide_text(z.read(n)) for n in ordered_names(z))


def main():
    fixdir = Path("target/pptx-fixtures")
    decks = sorted(fixdir.glob("seed*.pptx"),
                   key=lambda p: int(re.findall(r"\d+", p.name)[0]))
    if not decks:
        print("no fixtures — run: sbt 'testOnly graft.PptxSpec'", file=sys.stderr)
        sys.exit(2)
    bad = 0
    for deck in decks:
        golden = deck.with_suffix(".txt").read_text(encoding="utf-8")
        text = extract(deck.read_bytes())
        if text != golden:
            bad += 1
            print(f"{deck.name}: MISMATCH\n  got: {text!r}\n  want: {golden!r}")
        else:
            print(f"{deck.name}: OK")
    print(f"\n{len(decks) - bad}/{len(decks)} fixtures agree")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
