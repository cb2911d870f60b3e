#!/usr/bin/env python3
"""Independent mirror of the PDF fixture path (the Flac/gen_multimodal
recipe): re-parse the PDFs dumped by PdfSpec ('fixture dump' test writes
target/pdf-fixtures/seed*.pdf + .txt goldens) with a from-scratch PYTHON
extractor sharing zero code with either graft.ops.Pdf side, and compare
the extracted text against the golden logical text. Agreement is a real
differential check of the container: xref walk, indirect /Length,
FlateDecode, literal/hex strings, escapes, the Tj/TJ/'/"/Td/TD/T*/Tf
text semantics, and the FONT layer — /Resources /Font resolution with
page-tree inheritance and /ToUnicode CMap (bfchar/bfrange) decoding of
Type0/Identity-H glyph-id shows.

Run after `sbt "testOnly graft.PdfSpec"`:
    python3 tools/check_pdf_fixture.py
"""
import re
import sys
import zlib
from pathlib import Path
import hashlib

PAD = bytes([0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00,
             0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6,
             0xD0, 0x68, 0x3E, 0x80, 0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53,
             0x69, 0x7A])


def rc4(key, data):
    S = list(range(256))
    j = 0
    for i in range(256):
        j = (j + S[i] + key[i % len(key)]) & 0xFF
        S[i], S[j] = S[j], S[i]
    out = bytearray()
    x = y = 0
    for b in data:
        x = (x + 1) & 0xFF
        y = (y + S[x]) & 0xFF
        S[x], S[y] = S[y], S[x]
        out.append(b ^ S[(S[x] + S[y]) & 0xFF])
    return bytes(out)


class Decryptor:
    """Standard security handler, EMPTY user password (RC4-40/128,
    AES-128-CBC) — independent of the Scala implementation."""

    def __init__(self, enc, id0):
        assert enc["Filter"][1] == "Standard", "non-Standard handler"
        v, r = enc["V"][1], enc["R"][1]
        o = enc["O"][1].encode("latin-1")
        u = enc["U"][1].encode("latin-1")
        p = enc["P"][1] & 0xFFFFFFFF
        nbytes = 5 if v == 1 else enc.get("Length", ("num", 40))[1] // 8
        self.aes = False
        if v == 4:
            cfm = enc["CF"][1]["StdCF"][1]["CFM"][1]
            assert cfm in ("V2", "AESV2"), cfm
            self.aes = cfm == "AESV2"
        h = hashlib.md5(PAD + o + p.to_bytes(4, "little") + id0).digest()
        if r >= 3:
            for _ in range(50):
                h = hashlib.md5(h[:nbytes]).digest()
        key = h[:nbytes]
        if r == 2:
            ok = rc4(key, PAD) == u
        else:
            x = rc4(key, hashlib.md5(PAD + id0).digest())
            for i in range(1, 20):
                x = rc4(bytes(b ^ i for b in key), x)
            ok = x == u[:16]
        assert ok, "user password is not empty"
        self.key = key

    def decrypt(self, num, gen, data):
        ext = num.to_bytes(3, "little") + gen.to_bytes(2, "little")
        salt = b"sAlT" if self.aes else b""
        k = hashlib.md5(self.key + ext + salt).digest()
        k = k[:min(len(self.key) + 5, 16)]
        if not self.aes:
            return rc4(k, data)
        from cryptography.hazmat.primitives.ciphers import (
            Cipher, algorithms, modes)
        dec = Cipher(algorithms.AES(k), modes.CBC(bytes(data[:16]))).decryptor()
        pt = dec.update(bytes(data[16:])) + dec.finalize()
        return pt[:-pt[-1]]


WS = b" \t\r\n\f\x00"
DELIM = b"()<>[]{}/%"


class Lexer:
    def __init__(self, buf, pos=0):
        self.buf = buf
        self.pos = pos

    def cur(self):
        return self.buf[self.pos] if self.pos < len(self.buf) else None

    def skip_ws(self):
        while True:
            while self.cur() is not None and self.cur() in WS:
                self.pos += 1
            if self.cur() == ord("%"):
                while self.cur() is not None and self.cur() not in b"\r\n":
                    self.pos += 1
            else:
                return

    def at_end(self):
        self.skip_ws()
        return self.pos >= len(self.buf)

    def read_token(self):
        """One value or operator. Returns ('num', v) ('str', s) ('name', s)
        ('arr', list) ('dict', d) ('op', s) ('ref', (n, g))."""
        self.skip_ws()
        c = self.cur()
        if c is None:
            raise ValueError("eof")
        if c == ord("/"):
            self.pos += 1
            start = self.pos
            while self.cur() is not None and self.cur() not in WS + DELIM:
                self.pos += 1
            return ("name", self.buf[start:self.pos].decode("latin-1"))
        if c == ord("("):
            return ("str", self._literal())
        if c == ord("["):
            self.pos += 1
            items = []
            while True:
                self.skip_ws()
                if self.cur() == ord("]"):
                    self.pos += 1
                    return ("arr", items)
                items.append(self.read_value_ref())
        if c == ord("<"):
            if self.buf[self.pos + 1] == ord("<"):
                self.pos += 2
                d = {}
                while True:
                    self.skip_ws()
                    if self.cur() == ord(">"):
                        self.pos += 2
                        return ("dict", d)
                    k = self.read_token()
                    assert k[0] == "name", k
                    d[k[1]] = self.read_value_ref()
            return ("str", self._hexstr())
        if c in b"+-.0123456789":
            start = self.pos
            self.pos += 1
            while self.cur() is not None and self.cur() in b".0123456789":
                self.pos += 1
            txt = self.buf[start:self.pos].decode("latin-1")
            return ("num", float(txt) if "." in txt else int(txt))
        start = self.pos
        while self.cur() is not None and self.cur() not in WS + DELIM:
            self.pos += 1
        return ("op", self.buf[start:self.pos].decode("latin-1"))

    def read_value_ref(self):
        v = self.read_token()
        if v[0] == "num" and isinstance(v[1], int):
            save = self.pos
            try:
                g = self.read_token()
                if g[0] == "num" and isinstance(g[1], int):
                    r = self.read_token()
                    if r == ("op", "R"):
                        return ("ref", (v[1], g[1]))
                self.pos = save
            except (ValueError, IndexError):
                self.pos = save
        return v

    def _literal(self):
        self.pos += 1
        out = []
        depth = 1
        while True:
            c = self.cur()
            if c is None:
                raise ValueError("unterminated literal")
            if c == ord("\\"):
                self.pos += 1
                e = self.cur()
                mapped = {ord("n"): "\n", ord("r"): "\r", ord("t"): "\t",
                          ord("b"): "\b", ord("f"): "\f", ord("("): "(",
                          ord(")"): ")", ord("\\"): "\\"}
                if e in mapped:
                    out.append(mapped[e])
                    self.pos += 1
                elif e in b"\r\n":
                    self.pos += 1
                    if e == ord("\r") and self.cur() == ord("\n"):
                        self.pos += 1
                elif e is not None and ord("0") <= e <= ord("7"):
                    v = 0
                    for _ in range(3):
                        if self.cur() is not None and ord("0") <= self.cur() <= ord("7"):
                            v = v * 8 + (self.cur() - ord("0"))
                            self.pos += 1
                        else:
                            break
                    out.append(chr(v & 0xFF))
                else:
                    out.append(chr(e))
                    self.pos += 1
            elif c == ord("("):
                depth += 1
                out.append("(")
                self.pos += 1
            elif c == ord(")"):
                depth -= 1
                self.pos += 1
                if depth == 0:
                    return "".join(out)
                out.append(")")
            else:
                out.append(chr(c))
                self.pos += 1

    def _hexstr(self):
        self.pos += 1
        hx = []
        while self.cur() != ord(">"):
            if self.cur() is None:
                raise ValueError("unterminated hex")
            if self.cur() not in WS:
                hx.append(chr(self.cur()))
            self.pos += 1
        self.pos += 1
        if len(hx) % 2:
            hx.append("0")
        return "".join(chr(int("".join(hx[i:i + 2]), 16))
                       for i in range(0, len(hx), 2))


def png_unpredict(data, columns):
    """PNG row unfiltering at bpp=1 (PDF predictors 10-15)."""
    assert len(data) % (columns + 1) == 0
    out = bytearray()
    prev = bytes(columns)
    for r in range(len(data) // (columns + 1)):
        row = data[r * (columns + 1):(r + 1) * (columns + 1)]
        tag, enc = row[0], row[1:]
        cur = bytearray()
        for i in range(columns):
            left = cur[i - 1] if i > 0 else 0
            up = prev[i]
            ul = prev[i - 1] if i > 0 else 0
            if tag == 0:
                v = enc[i]
            elif tag == 1:
                v = enc[i] + left
            elif tag == 2:
                v = enc[i] + up
            elif tag == 3:
                v = enc[i] + (left + up) // 2
            elif tag == 4:
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if pa <= pb and pa <= pc else (up if pb <= pc else ul)
                v = enc[i] + pred
            else:
                raise ValueError(f"bad filter tag {tag}")
            cur.append(v & 0xFF)
        out.extend(cur)
        prev = cur
    return bytes(out)


class PdfDoc:
    def __init__(self, buf):
        assert buf[:5] == b"%PDF-", "bad header"
        at = buf.rfind(b"startxref")
        assert at >= 0
        lx = Lexer(buf, at + len(b"startxref"))
        t = lx.read_token()
        assert t[0] == "num"
        self.buf = buf
        self.offsets = {}   # num -> ("at", off) | ("stm", stmnum, idx)
        self._objstm = {}
        self.trailer = None
        # incremental updates: walk the /Prev chain, newest entry wins
        nxt, seen = t[1], set()
        while nxt is not None:
            assert nxt not in seen, "/Prev cycle"
            seen.add(nxt)
            probe = Lexer(buf, nxt)
            probe.skip_ws()
            if buf[probe.pos:probe.pos + 4] == b"xref":
                sec, trailer = self._xref_table(nxt)
            else:
                sec, trailer = self._xref_stream(nxt)
            if self.trailer is None:
                self.trailer = trailer
            for k, v in sec.items():
                self.offsets.setdefault(k, v)
            prev = trailer.get("Prev")
            nxt = prev[1] if prev is not None else None
        # standard security handler: /Encrypt + /ID[0] (the /Encrypt
        # dict itself and xref streams stay plaintext per spec)
        self.decryptor = None
        self.enc_num = -1
        enc = self.trailer.get("Encrypt")
        if enc is not None:
            self.enc_num = enc[1][0] if enc[0] == "ref" else -1
            ed = self.resolve(enc)[1]
            id0 = self.resolve(self.trailer["ID"])[1][0]
            self.decryptor = Decryptor(ed,
                self.resolve(id0)[1].encode("latin-1"))

    def _xref_table(self, off):
        buf = self.buf
        xl = Lexer(buf, off)
        assert xl.read_token() == ("op", "xref")
        sec = {}
        while True:
            xl.skip_ws()
            if buf[xl.pos:xl.pos + 7] == b"trailer":
                xl.pos += 7
                break
            start = xl.read_token()[1]
            count = xl.read_token()[1]
            for k in range(count):
                o = xl.read_token()[1]
                xl.read_token()  # gen
                xl.skip_ws()
                tpe = chr(buf[xl.pos])
                xl.pos += 1
                if tpe == "n":
                    sec[start + k] = ("at", o)
        return sec, xl.read_value_ref()[1]

    def _xref_stream(self, off):
        v, data, _, _ = self._parse_at(off)
        d = v[1]
        assert d["Type"][1] == "XRef"
        if d.get("Filter") is not None and d["Filter"][1] == "FlateDecode":
            data = zlib.decompress(data)
        parms = d.get("DecodeParms")
        if parms is not None and parms[1].get("Predictor", ("num", 1))[1] >= 10:
            data = png_unpredict(data, parms[1]["Columns"][1])
        w = [x[1] for x in d["W"][1]]
        size = d["Size"][1]
        idx = [x[1] for x in d.get("Index", ("arr", [("num", 0), ("num", size)]))[1]]
        pos = 0

        def field(width):
            nonlocal pos
            val = 0
            for _ in range(width):
                val = (val << 8) | data[pos]
                pos += 1
            return val

        sec = {}
        for start, count in zip(idx[::2], idx[1::2]):
            for k in range(count):
                tpe = 1 if w[0] == 0 else field(w[0])
                f2 = field(w[1])
                f3 = field(w[2])
                if tpe == 1:
                    sec[start + k] = ("at", f2)
                elif tpe == 2:
                    sec[start + k] = ("stm", f2, f3)
        return sec, d

    def _parse_at(self, off):
        lx = Lexer(self.buf, off)
        num = lx.read_token()[1]
        gen = lx.read_token()[1]
        assert lx.read_token() == ("op", "obj")
        v = lx.read_value_ref()
        lx.skip_ws()
        if self.buf[lx.pos:lx.pos + 6] == b"stream":
            lx.pos += 6
            if self.buf[lx.pos] == ord("\r"):
                lx.pos += 1
            if self.buf[lx.pos] == ord("\n"):
                lx.pos += 1
            length = self.resolve(v[1]["Length"])[1]
            data = self.buf[lx.pos:lx.pos + length]
            return v, data, num, gen
        return v, None, num, gen

    def obj(self, num):
        ent = self.offsets[num]
        if ent[0] == "at":
            v, data, n, gen = self._parse_at(ent[1])
            is_xref = v[0] == "dict" and \
                v[1].get("Type", (None, None))[1] == "XRef"
            if (self.decryptor is not None and data is not None
                    and num != self.enc_num and not is_xref):
                data = self.decryptor.decrypt(num, gen, data)
            return v, data
        stm = ent[1]
        if stm not in self._objstm:
            v, data = self.obj(stm)
            d = v[1]
            assert d["Type"][1] == "ObjStm"
            if d.get("Filter") is not None and d["Filter"][1] == "FlateDecode":
                data = zlib.decompress(data)
            n, first = d["N"][1], d["First"][1]
            hl = Lexer(data, 0)
            pairs = [(hl.read_token()[1], hl.read_token()[1]) for _ in range(n)]
            self._objstm[stm] = {
                onum: Lexer(data, first + rel).read_value_ref()
                for onum, rel in pairs
            }
        return self._objstm[stm][num], None

    def resolve(self, v):
        while v[0] == "ref":
            v = self.obj(v[1][0])[0]
        return v

    def _stream_data(self, ref):
        v, data = self.obj(ref[1][0])
        filt = v[1].get("Filter")
        if filt is not None and self.resolve(filt)[1] == "FlateDecode":
            data = zlib.decompress(data)
        return data

    def font_dec(self, fd):
        """-> (two_byte, cmap_or_None, refuse) for one font dict."""
        subtype = fd.get("Subtype")
        cmap = None
        if "ToUnicode" in fd:
            cmap = parse_tounicode(self._stream_data(fd["ToUnicode"]))
        if subtype is not None and self.resolve(subtype)[1] == "Type0":
            enc = fd.get("Encoding")
            identity = enc is not None and self.resolve(enc)[1] == "Identity-H"
            return (True, cmap, not (identity and cmap is not None))
        if cmap is not None:
            return (False, cmap, False)
        enc = fd.get("Encoding")
        if enc is None:
            return (False, None, False)
        name = self.resolve(enc)[1]
        std = ("WinAnsiEncoding", "MacRomanEncoding", "StandardEncoding")
        return (False, None, name not in std)

    def page_streams(self):
        """-> [(joined content bytes, {font name: decoder})] per page."""
        root = self.resolve(self.trailer["Root"])[1]
        out = []

        def fonts_of(res):
            if res is None:
                return {}
            rd = self.resolve(res)[1]
            if "Font" not in rd:
                return {}
            return {name: self.font_dec(self.resolve(fref)[1])
                    for name, fref in self.resolve(rd["Font"])[1].items()}

        def walk(node, inherited):
            res = node.get("Resources", inherited)
            if node["Type"][1] == "Pages":
                for kid in self.resolve(node["Kids"])[1]:
                    walk(self.resolve(kid)[1], res)
            else:
                cont = node["Contents"]
                # one logical stream per page: parts join on whitespace
                out.append((self._stream_data(cont), fonts_of(res)))

        walk(self.resolve(root["Pages"])[1], None)
        return out


def code_of(s):
    v = 0
    for ch in s:
        v = (v << 8) | ord(ch)
    return v


def dst_of(s):
    return bytes(ord(c) for c in s).decode("utf-16-be")


def parse_tounicode(data):
    """bfchar/bfrange sections of a /ToUnicode CMap -> {code: text}."""
    lx = Lexer(data, 0)
    m = {}
    mode, pend = 0, []
    while not lx.at_end():
        v = lx.read_token()
        if v[0] == "op":
            if v[1] == "beginbfchar":
                mode, pend = 1, []
            elif v[1] == "beginbfrange":
                mode, pend = 2, []
            elif v[1] in ("endbfchar", "endbfrange"):
                mode, pend = 0, []
            else:
                pend = []
            continue
        if mode == 1:
            pend.append(v)
            if len(pend) == 2:
                m[code_of(pend[0][1])] = dst_of(pend[1][1])
                pend = []
        elif mode == 2:
            pend.append(v)
            if len(pend) == 3:
                lo, hi, d = code_of(pend[0][1]), code_of(pend[1][1]), pend[2]
                if d[0] == "str":
                    base = dst_of(d[1])
                    for k in range(hi - lo + 1):
                        m[lo + k] = base[:-1] + chr(ord(base[-1]) + k)
                else:
                    for k, item in enumerate(d[1]):
                        m[lo + k] = dst_of(item[1])
                pend = []
    return m


def decode_show(font, raw):
    if font is None:
        raise ValueError("show before any Tf")
    two, cmap, refuse = font
    if refuse:
        raise ValueError("font with no encoding and no ToUnicode")
    if two:
        assert len(raw) % 2 == 0, "odd byte count in 2-byte-code show"
        codes = [(ord(raw[i]) << 8) | ord(raw[i + 1])
                 for i in range(0, len(raw), 2)]
    else:
        codes = [ord(c) for c in raw]
    if cmap is None:
        return raw
    return "".join(cmap[c] for c in codes)


def page_text(content, fonts):
    lx = Lexer(content, 0)
    out = []
    operands = []
    font = [None]

    def newline():
        if out and out[-1] != "\n":
            out.append("\n")

    def last_str():
        for v in reversed(operands):
            if v[0] == "str":
                return v[1]
        raise ValueError("show without string")

    while not lx.at_end():
        v = lx.read_token()
        if v[0] != "op":
            operands.append(v)
            continue
        op = v[1]
        if op == "Tj":
            out.append(decode_show(font[0], last_str()))
        elif op in ("'", '"'):
            newline()
            out.append(decode_show(font[0], last_str()))
        elif op == "TJ":
            arr = operands[-1]
            assert arr[0] == "arr"
            for item in arr[1]:
                if item[0] == "str":
                    out.append(decode_show(font[0], item[1]))
        elif op == "Tf":
            names = [o[1] for o in operands if o[0] == "name"]
            font[0] = fonts[names[0]]
        elif op in ("Td", "TD", "T*"):
            newline()
        operands = []
    return "".join(out)


def main():
    fixdir = Path("target/pdf-fixtures")
    pdfs = sorted(fixdir.glob("seed*.pdf"),
                  key=lambda p: int(re.findall(r"\d+", p.name)[0]))
    if not pdfs:
        print("no fixtures — run: sbt 'testOnly graft.PdfSpec'", file=sys.stderr)
        sys.exit(2)
    bad = 0
    for pdf in pdfs:
        golden = pdf.with_suffix(".txt").read_text(encoding="utf-8")
        doc = PdfDoc(pdf.read_bytes())
        text = "\n".join(page_text(c, f) for c, f in doc.page_streams())
        status = "OK" if text == golden else "MISMATCH"
        if text != golden:
            bad += 1
            print(f"{pdf.name}: {status}\n  got: {text!r}\n  want: {golden!r}")
        else:
            print(f"{pdf.name}: {status}")
    print(f"\n{len(pdfs) - bad}/{len(pdfs)} fixtures agree")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
