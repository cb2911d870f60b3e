#!/usr/bin/env python3
"""Independent mirror of the markdown fixture path: re-parse the .md
files dumped by MarkdownSpec ('fixture dump' writes
target/md-fixtures/seed*.md + .txt goldens) with a from-scratch Python
extractor — zero shared code with graft.ops.Markdown — and compare the
extracted text against the golden logical text. Agreement is a real
differential check of the grammar: front matter, fence verbatim-ness,
setext/thematic/refdef dropping, quote/list/heading marker stripping,
GFM table joining, emphasis flanking, code-span protection,
link/image/autolink/tag handling, escapes and entity decoding.

Run after `sbt "testOnly graft.MarkdownSpec"`:
    python3 tools/check_md_fixture.py
"""
import re
import sys
from html import unescape
from pathlib import Path

ESCAPABLE = set(r"""!"#$%&'()*+,-./:;<=>?@[\]^_`{|}~""")


def code_span(s, i):
    """(content, next) for a backtick run at i, or None."""
    j = i
    while j < len(s) and s[j] == "`":
        j += 1
    run = j - i
    k = j
    while k < len(s):
        if s[k] == "`":
            m = k
            while m < len(s) and s[m] == "`":
                m += 1
            if m - k == run:
                return s[j:k], m
            k = m
        else:
            k += 1
    return None


def link(s, i):
    """(label, next) for [label](dest) / [label][ref]; None for bare."""
    depth, j = 1, i + 1
    while j < len(s) and depth:
        if s[j] == "\\":
            j += 2
            continue
        depth += {"[": 1, "]": -1}.get(s[j], 0)
        j += 1
    if depth:
        return None
    label = s[i + 1:j - 1]
    if j < len(s) and s[j] == "(":
        pd, k = 1, j + 1
        while k < len(s) and pd:
            if s[k] == "\\":
                k += 2
                continue
            pd += {"(": 1, ")": -1}.get(s[k], 0)
            k += 1
        return (label, k) if pd == 0 else None
    if j < len(s) and s[j] == "[":
        rb = s.find("]", j + 1)
        return (label, rb + 1) if rb >= 0 else None
    return None


def entity(s, i):
    m = re.match(r"&(#x?[0-9A-Fa-f]+|[A-Za-z][A-Za-z0-9]*);", s[i:i + 34])
    if not m:
        return None
    out = unescape(m.group(0))
    if out == m.group(0):  # unknown name stays literal
        return None
    # numeric out-of-range: html.unescape maps to U+FFFD; our Scala side
    # treats those as literal — mirror that for >0x10FFFF / surrogates
    if m.group(1).startswith("#"):
        num = m.group(1)[1:]
        cp = int(num[1:], 16) if num[:1] in "xX" else int(num)
        if cp <= 0 or cp > 0x10FFFF or 0xD800 <= cp <= 0xDFFF:
            return None
        out = chr(cp)
    return out, i + m.end()


def inline(s, depth=0):
    if depth > 8:
        return s
    toks = []  # (text, delim_char or '', can_open, can_close)
    buf = []
    i, n = 0, len(s)

    def flush():
        if buf:
            toks.append(["".join(buf), "", False, False])
            buf.clear()

    while i < n:
        c = s[i]
        if c == "\\":
            if i + 1 >= n:
                i += 1
            elif s[i + 1] in ESCAPABLE:
                buf.append(s[i + 1])
                i += 2
            else:
                buf.append("\\")
                i += 1
        elif c == "`":
            got = code_span(s, i)
            if got:
                flush()
                toks.append([got[0], "", False, False])
                i = got[1]
            else:
                j = i
                while j < n and s[j] == "`":
                    j += 1
                buf.append(s[i:j])
                i = j
        elif c == "<":
            gt = s.find(">", i + 1)
            inner = s[i + 1:gt] if gt > i else ""
            if gt > i and re.fullmatch(r"[A-Za-z][A-Za-z0-9+.-]*://[^\s<>]+", inner):
                flush(); toks.append([inner, "", False, False]); i = gt + 1
            elif gt > i and re.fullmatch(r"[^\s@<>]+@[^\s@<>]+\.[^\s@<>]+", inner):
                flush(); toks.append([inner, "", False, False]); i = gt + 1
            elif gt > i and re.fullmatch(r"/?[A-Za-z][A-Za-z0-9-]*([ \t][^>]*)?/?", inner):
                i = gt + 1
            else:
                buf.append("<")
                i += 1
        elif c == "&":
            got = entity(s, i)
            if got:
                buf.append(got[0])
                i = got[1]
            else:
                buf.append("&")
                i += 1
        elif c == "!" and i + 1 < n and s[i + 1] == "[":
            got = link(s, i + 1)
            if got:
                flush(); toks.append([inline(got[0], depth + 1), "", False, False])
                i = got[1]
            else:
                buf.append("!")
                i += 1
        elif c == "[":
            got = link(s, i)
            if got:
                flush(); toks.append([inline(got[0], depth + 1), "", False, False])
                i = got[1]
            else:
                buf.append("[")
                i += 1
        elif c in "*_~":
            j = i
            while j < n and s[j] == c:
                j += 1
            run = j - i
            if c == "~" and run != 2:
                buf.append(s[i:j])
                i = j
                continue
            prev = s[i - 1] if i else " "
            nxt = s[j] if j < n else " "
            can_open = not nxt.isspace()
            can_close = i > 0 and not prev.isspace()
            if c == "_":
                can_open = can_open and not prev.isalnum()
                can_close = can_close and not (j < n and nxt.isalnum())
            flush()
            toks.append([s[i:j], c, can_open, can_close])
            i = j
        else:
            buf.append(c)
            i += 1
    flush()
    # delimiter matching: nearest same-char opener
    opens = []
    for idx, t in enumerate(toks):
        if not t[1]:
            continue
        matched = False
        if t[3]:
            for k in range(len(opens) - 1, -1, -1):
                o = toks[opens[k]]
                if o[1] == t[1]:
                    used = min(len(o[0]), len(t[0]))
                    o[0] = o[0][:-used] or ""
                    t[0] = t[0][:-used] or ""
                    keep = 1 if o[0] else 0
                    del opens[k + keep:]
                    matched = True
                    break
        if not matched and t[2]:
            opens.append(idx)
    return "".join(t[0] for t in toks)


def table_row(s):
    cells, cur, i = [], [], 0
    while i < len(s):
        if s[i] == "\\" and i + 1 < len(s) and s[i + 1] == "|":
            cur.append("|")
            i += 2
        elif s[i] == "|":
            cells.append("".join(cur))
            cur.clear()
            i += 1
        else:
            cur.append(s[i])
            i += 1
    cells.append("".join(cur))
    if cells and not cells[0].strip():
        cells = cells[1:]
    if cells and not cells[-1].strip():
        cells = cells[:-1]
    if not cells:
        return None
    if all(re.fullmatch(r":?-+:?", c.strip()) for c in cells):
        return None
    return "\t".join(inline(c).strip() for c in cells).strip(" \t")


def is_rule(t):
    sq = t.replace(" ", "")
    if not sq or len(set(sq)) != 1:
        return False
    c = sq[0]
    return c in "=-" or (c in "*_" and len(sq) >= 3)


def extract(md):
    md = md.replace("\0", "�")
    lines = [l[:-1] if l.endswith("\r") else l for l in md.split("\n")]
    out = []
    i = 0
    if lines and lines[0].strip() == "---" and lines[0].startswith("---"):
        for j in range(1, len(lines)):
            if lines[j].strip() in ("---", "..."):
                i = j + 1
                break
    fence_char, fence_len = "", 0
    prev_blank, prev_code = True, False
    while i < len(lines):
        line = lines[i]
        t = line.strip()
        i += 1
        if fence_char:
            if (t and set(t) == {fence_char} and len(t) >= fence_len
                    and line.index(fence_char) <= 3):
                fence_char = ""
                prev_blank, prev_code = True, False
            else:
                out.append(line)
            continue
        m = re.match(r"^ {0,3}(`{3,}|~{3,})(.*)$", line)
        if m and not (m.group(1)[0] == "`" and "`" in m.group(2)):
            fence_char, fence_len = m.group(1)[0], len(m.group(1))
            prev_blank, prev_code = False, False
            continue
        if not t:
            prev_blank, prev_code = True, False
            continue
        if is_rule(t):
            prev_blank, prev_code = True, False
            continue
        if re.match(r"^ {0,3}\[[^\]]*\]:[ \t]*\S", line):
            prev_blank, prev_code = False, False
            continue
        if (line.startswith("    ") or line.startswith("\t")) and (prev_blank or prev_code):
            out.append(line[1:] if line.startswith("\t") else line[4:])
            prev_blank, prev_code = False, True
            continue
        s = line
        while True:
            r = re.sub(r"^ {0,3}> ?", "", s, count=1)
            if r == s:
                break
            s = r
        for _ in range(4):
            r = re.sub(r"^ {0,3}(?:[-+*]|\d{1,9}[.)])[ \t]+", "", s, count=1)
            if r == s or not r.strip():
                break
            s = r
        if s.strip().startswith("|"):
            row = table_row(s)
            if row is not None:
                out.append(row)
        else:
            m = re.match(r"^ {0,3}#{1,6}([ \t]+|$)", s)
            if m:
                s = s[m.end():]
                s = re.sub(r"[ \t]+#+[ \t]*$", "", s)
            res = inline(s).strip(" \t")
            if res:
                out.append(res)
        prev_blank, prev_code = False, False
    return out


def main():
    fixdir = Path("target/md-fixtures")
    files = sorted(fixdir.glob("seed*.md"), key=lambda f: int(f.stem[4:]))
    if not files:
        print("no fixtures found — run `sbt 'testOnly graft.MarkdownSpec'` first",
              file=sys.stderr)
        return 1
    bad = 0
    for f in files:
        golden = f.with_suffix(".txt").read_text(encoding="utf-8")
        got = "\n".join(extract(f.read_text(encoding="utf-8")))
        if got != golden:
            bad += 1
            print(f"MISMATCH {f.name}:\n  got    {got!r}\n  golden {golden!r}")
        else:
            print(f"OK {f.name}")
    print(f"{len(files) - bad}/{len(files)} agree")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
