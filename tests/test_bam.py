"""BAM binary input round-trip (VERDICT r1 item 7).

Writes a real BGZF BAM (gzip members with the BC extra subfield + EOF
block, as htslib emits) containing reads with qualities, aux tags, and a
reverse-strand record; checks read_bam decoding and an end-to-end align
with --passthrough re-emitting the original tags
(reference: Input.h:296-388, Alignment.h:780-790 passthrough).
"""

import struct
import subprocess
import sys
import os
import zlib

import numpy as np
import pytest

from lra_tpu import seq as sequtils
from lra_tpu.io.bam import read_bam
from lra_tpu.sim import random_genome, sample_read

_SEQ_NIBBLE = {c: i for i, c in enumerate("=ACMGRSVTWYHKDBN")}


def bgzf_block(payload: bytes) -> bytes:
    raw = zlib.compress(payload, 6)[2:-4]  # raw deflate
    bsize = len(raw) + 25  # total block length (26 + raw) minus 1
    return (b"\x1f\x8b\x08\x04" + b"\x00" * 4 + b"\x00\xff"
            + struct.pack("<H", 6) + b"BC" + struct.pack("<HH", 2, bsize)
            + raw + struct.pack("<II", zlib.crc32(payload),
                                len(payload) & 0xFFFFFFFF))


BGZF_EOF = bytes.fromhex(
    "1f8b08040000000000ff0600424302001b0003000000000000000000")


def bam_record(name: str, seq: str, qual: bytes, flag: int,
               tags: bytes) -> bytes:
    l_seq = len(seq)
    seq4 = bytearray()
    for i in range(0, l_seq, 2):
        hi = _SEQ_NIBBLE[seq[i]]
        lo = _SEQ_NIBBLE[seq[i + 1]] if i + 1 < l_seq else 0
        seq4.append((hi << 4) | lo)
    body = struct.pack("<iiBBHHHiiii", -1, -1, len(name) + 1, 0, 0, 0,
                       flag, l_seq, -1, -1, 0)
    body += name.encode() + b"\x00" + bytes(seq4) + qual + tags
    return struct.pack("<i", len(body)) + body


def write_bam(path, records):
    header_text = b"@HD\tVN:1.6\n"
    payload = b"BAM\x01" + struct.pack("<i", len(header_text)) + \
        header_text + struct.pack("<i", 0)
    for rec in records:
        payload += rec
    with open(path, "wb") as f:
        # split payload across two BGZF blocks to prove multi-member reads
        mid = len(payload) // 2
        f.write(bgzf_block(payload[:mid]))
        f.write(bgzf_block(payload[mid:]))
        f.write(BGZF_EOF)


@pytest.fixture(scope="module")
def bam_world(tmp_path_factory):
    d = tmp_path_factory.mktemp("bam")
    rng = np.random.default_rng(17)
    g = random_genome(rng, 60000)
    (d / "ref.fa").write_text(">chr1\n" + sequtils.decode(g) + "\n")
    reads = []
    for i in range(3):
        r = sample_read(rng, g, 2500, snp=0.003)
        reads.append((f"r{i}", sequtils.decode(r.codes)))
    recs = []
    seqs = {}
    for i, (name, seq) in enumerate(reads):
        qual = bytes([30 + (i % 10)] * len(seq))
        tags = b"ZXZhello\x00" + b"XYi" + struct.pack("<i", 7)
        if i == 2:
            # store reverse-complemented with flag 16: the reader must
            # restore original orientation
            comp = str.maketrans("ACGTN", "TGCAN")
            stored = seq.translate(comp)[::-1]
            recs.append(bam_record(name, stored, qual[::-1], 16, tags))
        else:
            recs.append(bam_record(name, seq, qual, 0, tags))
        seqs[name] = seq
    write_bam(d / "reads.bam", recs)
    return d, seqs


def test_read_bam_decodes(bam_world):
    d, seqs = bam_world
    got = list(read_bam(str(d / "reads.bam")))
    assert [r.name for r in got] == ["r0", "r1", "r2"]
    for r in got:
        assert r.seq.decode() == seqs[r.name], r.name
        assert r.qual is not None and len(r.qual) == len(r.seq)
        assert "ZX:Z:hello" in r.passthrough
        assert "XY:i:7" in r.passthrough
    assert got[2].flag == 16


def _aux_zoo() -> bytes:
    """One tag of every BAM aux type (reference: Input.h:296-388)."""
    t = b""
    t += b"AAA" + b"Q"                                   # A
    t += b"ABc" + struct.pack("b", -5)                   # int8
    t += b"ACC" + struct.pack("B", 200)                  # uint8
    t += b"ADs" + struct.pack("<h", -3000)               # int16
    t += b"AES" + struct.pack("<H", 60000)               # uint16
    t += b"AFi" + struct.pack("<i", -100000)             # int32
    t += b"AGI" + struct.pack("<I", 3000000000)          # uint32
    t += b"AHf" + struct.pack("<f", 1.5)                 # float
    t += b"AIZ" + b"hello world\x00"                     # string
    t += b"AJH" + b"1AFF\x00"                            # hex string
    for sub, fmt, vals in (("c", "b", [-1, 2]), ("C", "B", [3, 250]),
                           ("s", "<h", [-300, 301]), ("S", "<H", [65000, 1]),
                           ("i", "<i", [-70000, 2]), ("I", "<I", [4000000000]),
                           ("f", "<f", [0.25, -2.0])):
        body = b"".join(struct.pack(fmt, v) for v in vals)
        t += (f"B{sub}".encode() + b"B" + sub.encode()
              + struct.pack("<I", len(vals)) + body)
    return t


def test_aux_type_zoo(tmp_path):
    """Every aux type decodes; CG long-CIGAR records parse; missing qual
    (0xFF fill) maps to None; a record split mid-struct across BGZF
    blocks decodes (reference: Input.h:296-388 aux handling)."""
    seq = "ACGTACGTAC"
    # record 1: full aux zoo
    r1 = bam_record("z0", seq, bytes([40] * 10), 0, _aux_zoo())
    # record 2: >65535-op CIGAR via CG:B,I tag + placeholder cigar ops;
    # n_cigar_op bytes must be skipped, CG array must parse
    n_ops = 70000
    cg = (b"CGBI" + struct.pack("<I", n_ops)
          + struct.pack("<I", (10 << 4) | 4) * n_ops)
    body = struct.pack("<iiBBHHHiiii", 0, 100, 3, 30, 0, 2, 0,
                       10, -1, -1, 0)
    body += b"z1\x00" + struct.pack("<II", (5 << 4) | 3, (10 << 4) | 4)
    seq4 = bytearray()
    for i in range(0, 10, 2):
        seq4.append((_SEQ_NIBBLE[seq[i]] << 4) | _SEQ_NIBBLE[seq[i + 1]])
    body += bytes(seq4) + bytes([0xFF] * 10) + cg
    r2 = struct.pack("<i", len(body)) + body
    # record 3: plain, lands after the giant one
    r3 = bam_record("z2", seq, bytes([20] * 10), 0, b"NMi" + struct.pack("<i", 1))
    header_text = b"@HD\tVN:1.6\n"
    payload = (b"BAM\x01" + struct.pack("<i", len(header_text)) + header_text
               + struct.pack("<i", 1) + struct.pack("<i", 5) + b"chr1\x00"
               + struct.pack("<i", 1000) + r1 + r2 + r3)
    path = tmp_path / "zoo.bam"
    with open(path, "wb") as f:
        # force splits inside r1's fixed-size struct and inside r2's CG array
        cut1 = len(payload) - len(r1) - len(r2) - len(r3) + 10
        cut2 = cut1 + len(r1) + 60
        f.write(bgzf_block(payload[:cut1]))
        f.write(bgzf_block(payload[cut1:cut2]))
        f.write(bgzf_block(payload[cut2:]))
        f.write(BGZF_EOF)
    got = list(read_bam(str(path)))
    assert [r.name for r in got] == ["z0", "z1", "z2"]
    tags = got[0].passthrough
    for want in ("AA:A:Q", "AB:i:-5", "AC:i:200", "AD:i:-3000",
                 "AE:i:60000", "AF:i:-100000", "AG:i:3000000000",
                 "AH:f:1.5", "AI:Z:hello world", "AJ:H:1AFF",
                 "Bc:B:c,-1,2", "BC:B:C,3,250", "Bs:B:s,-300,301",
                 "BS:B:S,65000,1", "Bi:B:i,-70000,2", "BI:B:I,4000000000",
                 "Bf:B:f,0.25,-2"):
        assert want in tags, (want, tags)
    assert got[1].seq.decode() == seq
    assert got[1].qual is None          # 0xFF fill = missing qual
    assert got[1].passthrough.startswith("CG:B:I,164,")
    assert got[1].passthrough.count(",") == n_ops
    assert got[2].passthrough == "NM:i:1"


def test_align_bam_passthrough(bam_world):
    d, _ = bam_world
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=os.path.dirname(os.path.dirname(
                   os.path.abspath(__file__))))
    out = subprocess.run(
        [sys.executable, "-m", "lra_tpu.cli", "align", "-CCS", "ref.fa",
         "reads.bam", "--cpu", "--passthrough", "-o", "out.sam"],
        cwd=d, env=env, capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-500:]
    body = [ln.split("\t") for ln in (d / "out.sam").read_text()
            .splitlines() if not ln.startswith("@")]
    prim = {f[0]: f for f in body if f[1] in ("0", "16")}
    assert set(prim) == {"r0", "r1", "r2"}
    for name, f in prim.items():
        line = "\t".join(f)
        assert "ZX:Z:hello" in line and "XY:i:7" in line, name
