#!/usr/bin/env python3
"""Independent mirror of the XLSX fixture path: re-parse the .xlsx files
dumped by XlsxSpec ('fixture dump' writes target/xlsx-fixtures/seed*.xlsx
+ .txt goldens) with Python's zipfile + ElementTree — zero shared code
with graft.ops.Xlsx — and compare against the golden logical text.
Checks shared-string resolution (dedup + rich-text run concatenation),
inlineStr/formula/numeric cells, and sheet ordering (workbook.xml
<sheets> rels order when the part is present, numeric part order
otherwise).

Run after `sbt "testOnly graft.XlsxSpec"`:
    python3 tools/check_xlsx_fixture.py
"""
import re
import sys
import zipfile
import io
import xml.etree.ElementTree as ET
from pathlib import Path

NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
SHEET = re.compile(r"xl/worksheets/sheet(\d+)\.xml$")


def shared_strings(xml):
    root = ET.fromstring(xml)
    out = []
    for si in root.iter(NS + "si"):
        out.append("".join(t.text or "" for t in si.iter(NS + "t")))
    return out


def sheet_text(xml, sst):
    root = ET.fromstring(xml)
    rows = []
    for row in root.iter(NS + "row"):
        cells = []
        for c in row.iter(NS + "c"):
            t = c.get("t")
            if t == "s":
                idx = int(c.find(NS + "v").text)
                cells.append(sst[idx])
            elif t == "inlineStr":
                is_el = c.find(NS + "is")
                cells.append("".join(x.text or "" for x in is_el.iter(NS + "t")))
            else:
                v = c.find(NS + "v")
                cells.append(v.text or "" if v is not None else "")
        rows.append("\t".join(cells))
    return "\n".join(rows)


R = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
PKR = "{http://schemas.openxmlformats.org/package/2006/relationships}"


def ordered_names(z, names):
    if "xl/workbook.xml" in names:
        rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
        target = {rel.get("Id"): rel.get("Target")
                  for rel in rels.iter(PKR + "Relationship")
                  if rel.get("Type").endswith("/worksheet")}
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        return ["xl/" + target[sh.get(R + "id")]
                for sh in wb.iter(NS + "sheet")]
    return [n for _, n in sorted(
        (int(SHEET.match(n).group(1)), n) for n in names if SHEET.match(n))]


def extract(data):
    with zipfile.ZipFile(io.BytesIO(data)) as z:
        names = z.namelist()
        sst = (shared_strings(z.read("xl/sharedStrings.xml"))
               if "xl/sharedStrings.xml" in names else [])
        return "\n".join(sheet_text(z.read(n), sst)
                         for n in ordered_names(z, names))


def main():
    fixdir = Path("target/xlsx-fixtures")
    books = sorted(fixdir.glob("seed*.xlsx"),
                   key=lambda p: int(re.findall(r"\d+", p.name)[0]))
    if not books:
        print("no fixtures — run: sbt 'testOnly graft.XlsxSpec'", file=sys.stderr)
        sys.exit(2)
    bad = 0
    for book in books:
        golden = book.with_suffix(".txt").read_text(encoding="utf-8")
        text = extract(book.read_bytes())
        if text != golden:
            bad += 1
            print(f"{book.name}: MISMATCH\n  got: {text!r}\n  want: {golden!r}")
        else:
            print(f"{book.name}: OK")
    print(f"\n{len(books) - bad}/{len(books)} fixtures agree")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
