"""Generate wmix_tpu/codecs/_sbr_tables.py — constant data for the
HE-AAC v2 (SBR + PS) decode path, read from the compiled reference
probe (.oracle/libfaad_sbr_probe.so, a -Dstatic= unity build of faad2
with SBR_DEC/PS_DEC): the QMF prototype filter, DCT-IV/FFT twiddles,
envelope dequantization tables, the SBR noise table V, the
envelope/noise huffman trees, and the full PS table set (IID/ICC
scalefactors, rotation angles, hybrid filters, allpass fractions).

Function-local tables (which -Dstatic= turns into autos, not symbols)
are parsed out of the reference sources instead: the frequency-band
helper tables of sbr_fbt.c and the smoothing/limiter constants.

Run:  python oracle/gen_sbr_tables.py   (after oracle/build_oracle.sh)
"""
import ctypes as C
import os
import re

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
SO_PATH = os.path.join(REPO, ".oracle", "libfaad_sbr_probe.so")
SRC = os.path.join(REPO, ".oracle", "faadsbrsrc", "faad2-2.8.8", "libfaad")
OUT = os.path.join(REPO, "wmix_tpu", "codecs", "_sbr_tables.py")

lib = C.CDLL(SO_PATH)


def _addr(sym):
    return C.addressof(C.c_int.in_dll(lib, sym))


def _f32(sym, count):
    return np.array((C.c_float * count).from_address(_addr(sym)),
                    np.float32)


def _i8(sym, count):
    return np.array((C.c_int8 * count).from_address(_addr(sym)), np.int64)


def _u8(sym, count):
    return np.array((C.c_uint8 * count).from_address(_addr(sym)), np.int64)


def _u16(sym, count):
    return np.array((C.c_uint16 * count).from_address(_addr(sym)),
                    np.int64)


F32 = [  # (name, symbol, count[, reshape])
    ("QMF_C", "qmf_c", 640),
    ("DCT4_64_TAB", "dct4_64_tab", 192),
    ("W_ARRAY_REAL", "w_array_real", 16),
    ("W_ARRAY_IMAG", "w_array_imag", 16),
    ("QMF32_PRE_TWIDDLE", "qmf32_pre_twiddle", 64, (32, 2)),
    ("E_DEQ_TAB", "E_deq_tab", 64),
    ("Q_DIV_TAB", "Q_div_tab", 31),
    ("Q_DIV_TAB_LEFT", "Q_div_tab_left", 31 * 13, (31, 13)),
    ("Q_DIV_TAB_RIGHT", "Q_div_tab_right", 31 * 13, (31, 13)),
    ("Q_DIV2_TAB", "Q_div2_tab", 31),
    ("Q_DIV2_TAB_LEFT", "Q_div2_tab_left", 31 * 13, (31, 13)),
    ("Q_DIV2_TAB_RIGHT", "Q_div2_tab_right", 31 * 13, (31, 13)),
    ("V_NOISE", "V", 1024, (512, 2)),
    ("SF_IID_NORMAL", "sf_iid_normal", 15),
    ("SF_IID_FINE", "sf_iid_fine", 31),
    ("COS_ALPHAS", "cos_alphas", 8),
    ("SIN_ALPHAS", "sin_alphas", 8),
    ("COS_BETAS_NORMAL", "cos_betas_normal", 8 * 8, (8, 8)),
    ("SIN_BETAS_NORMAL", "sin_betas_normal", 8 * 8, (8, 8)),
    ("COS_BETAS_FINE", "cos_betas_fine", 16 * 8, (16, 8)),
    ("SIN_BETAS_FINE", "sin_betas_fine", 16 * 8, (16, 8)),
    ("SINCOS_ALPHAS_B_NORMAL", "sincos_alphas_B_normal", 15 * 8, (15, 8)),
    ("SINCOS_ALPHAS_B_FINE", "sincos_alphas_B_fine", 31 * 8, (31, 8)),
    ("COS_GAMMAS_NORMAL", "cos_gammas_normal", 8 * 8, (8, 8)),
    ("SIN_GAMMAS_NORMAL", "sin_gammas_normal", 8 * 8, (8, 8)),
    ("COS_GAMMAS_FINE", "cos_gammas_fine", 16 * 8, (16, 8)),
    ("SIN_GAMMAS_FINE", "sin_gammas_fine", 16 * 8, (16, 8)),
    ("IPDOPD_COS_TAB", "ipdopd_cos_tab", 8),
    ("IPDOPD_SIN_TAB", "ipdopd_sin_tab", 8),
    ("PHI_FRACT_QMF", "Phi_Fract_Qmf", 128, (64, 2)),
    ("PHI_FRACT_SUBQMF20", "Phi_Fract_SubQmf20", 24, (12, 2)),
    ("PHI_FRACT_SUBQMF34", "Phi_Fract_SubQmf34", 64, (32, 2)),
    ("Q_FRACT_ALLPASS_QMF", "Q_Fract_allpass_Qmf", 64 * 6, (64, 3, 2)),
    ("Q_FRACT_ALLPASS_SUBQMF20", "Q_Fract_allpass_SubQmf20", 72,
     (12, 3, 2)),
    ("Q_FRACT_ALLPASS_SUBQMF34", "Q_Fract_allpass_SubQmf34", 192,
     (32, 3, 2)),
    ("P2_13_20", "p2_13_20", 7),
    ("P8_13_20", "p8_13_20", 7),
    ("P4_13_34", "p4_13_34", 7),
    ("P8_13_34", "p8_13_34", 7),
    ("P12_13_34", "p12_13_34", 7),
    ("FILTER_A", "filter_a", 3),
]

I8_PAIRS = [
    ("T_HUFF_ENV_1_5", "t_huffman_env_1_5dB", 120),
    ("F_HUFF_ENV_1_5", "f_huffman_env_1_5dB", 120),
    ("T_HUFF_ENV_BAL_1_5", "t_huffman_env_bal_1_5dB", 48),
    ("F_HUFF_ENV_BAL_1_5", "f_huffman_env_bal_1_5dB", 48),
    ("T_HUFF_ENV_3_0", "t_huffman_env_3_0dB", 62),
    ("F_HUFF_ENV_3_0", "f_huffman_env_3_0dB", 62),
    ("T_HUFF_ENV_BAL_3_0", "t_huffman_env_bal_3_0dB", 24),
    ("F_HUFF_ENV_BAL_3_0", "f_huffman_env_bal_3_0dB", 24),
    ("T_HUFF_NOISE_3_0", "t_huffman_noise_3_0dB", 62),
    ("T_HUFF_NOISE_BAL_3_0", "t_huffman_noise_bal_3_0dB", 24),
    # PS huffman trees (ps_syntax.c)
    ("F_HUFF_IID_DEF", "f_huff_iid_def", 28),
    ("T_HUFF_IID_DEF", "t_huff_iid_def", 28),
    ("F_HUFF_IID_FINE", "f_huff_iid_fine", 60),
    ("T_HUFF_IID_FINE", "t_huff_iid_fine", 60),
    ("F_HUFF_ICC", "f_huff_icc", 14),
    ("T_HUFF_ICC", "t_huff_icc", 14),
    ("F_HUFF_IPD", "f_huff_ipd", 7),
    ("T_HUFF_IPD", "t_huff_ipd", 7),
    ("F_HUFF_OPD", "f_huff_opd", 7),
    ("T_HUFF_OPD", "t_huff_opd", 7),
]

U8 = [
    ("GROUP_BORDER20", "group_border20", 23),
    ("GROUP_BORDER34", "group_border34", 51),
]
U16 = [
    ("MAP_GROUP2BK20", "map_group2bk20", 22),
    ("MAP_GROUP2BK34", "map_group2bk34", 50),
]


def _parse_local_table(path, name, flat_count, dtype=float,
                       must_contain=None):
    """Parse a function-local static table out of the C source.

    A name can be defined once per calculate_gain variant (fixed-point,
    log2, plain float); `must_contain` picks the right occurrence by a
    distinctive literal (e.g. limGain's plain-float "1e10")."""
    src = open(path).read()
    bodies = [m.group(1) for m in re.finditer(
        name + r"\s*\[[\]\[0-9 ]*\]\s*=\s*\{(.*?)\};", src, re.S)]
    if must_contain is not None:
        bodies = [b for b in bodies if must_contain in b]
    assert bodies, (name, must_contain)
    body = bodies[0]
    body = re.sub(r"/\*.*?\*/", "", body, flags=re.S)
    body = body.replace("FRAC_CONST", "").replace("COEF_CONST", "") \
        .replace("REAL_CONST", "").replace("(", "").replace(")", "") \
        .replace("{", "").replace("}", "")
    vals = [dtype(v) for v in body.replace("\n", " ").split(",")
            if v.strip()]
    assert len(vals) == flat_count, (name, len(vals))
    return vals


lines = [
    '"""SBR/PS constant tables (GENERATED by oracle/gen_sbr_tables.py -',
    "do not edit): QMF prototype, DCT-IV/FFT twiddles, dequantization",
    "and huffman tables, and the PS rotation/hybrid/allpass table set,",
    'read from the compiled reference probe."""',
    "import numpy as np",
    "",
]
for entry in F32:
    name, sym, count = entry[0], entry[1], entry[2]
    a = _f32(sym, count)
    if len(entry) == 4:
        a = a.reshape(entry[3])
    lines.append(f"{name} = np.array({a.tolist()!r}, np.float32)")
for name, sym, count in I8_PAIRS:
    a = _i8(sym, 2 * count).reshape(count, 2)
    lines.append(f"{name} = np.array({a.tolist()!r}, np.int64)")
for name, sym, count in U8:
    lines.append(f"{name} = np.array({_u8(sym, count).tolist()!r},"
                 " np.int64)")
for name, sym, count in U16:
    lines.append(f"{name} = np.array({_u16(sym, count).tolist()!r},"
                 " np.int64)")

# function-local tables, parsed from source (ISO 14496-3 data)
fbt = os.path.join(SRC, "sbr_fbt.c")
lines.append("START_MIN = np.array(%r, np.int64)" %
             _parse_local_table(fbt, "startMinTable", 12, int))
lines.append("OFFSET_INDEX = np.array(%r, np.int64)" %
             _parse_local_table(fbt, "offsetIndexTable", 12, int))
src = open(fbt).read()
offs = re.findall(r"offset\s*\[(\d+)\]\s*\[(\d+)\]\s*=\s*\{(.*?)\};",
                  src, re.S)
assert len(offs) == 2
for tag, (r, c, body) in zip(("START_OFFSET", "STOP_OFFSET"), offs):
    vals = [int(v) for v in re.sub(r"[{}]", "", body).split(",")
            if v.strip()]
    assert len(vals) == int(r) * int(c)
    arr = np.array(vals, np.int64).reshape(int(r), int(c))
    lines.append(f"{tag} = np.array({arr.tolist()!r}, np.int64)")
lines.append("STOP_MIN = np.array(%r, np.int64)" %
             _parse_local_table(fbt, "stopMinTable", 12, int))
lines.append("LIMITER_BANDS_COMPARE = np.array(%r, np.float32)" %
             _parse_local_table(fbt, "limiterBandsCompare", 3))
hfgen = os.path.join(SRC, "sbr_hfgen.c")
lines.append("GOAL_SB_TAB = np.array(%r, np.int64)" %
             _parse_local_table(hfgen, "goalSbTab", 12, int))
hfadj = os.path.join(SRC, "sbr_hfadj.c")
lines.append("H_SMOOTH = np.array(%r, np.float32)" %
             _parse_local_table(hfadj, "h_smooth", 5))
lines.append("LIM_GAIN = np.array(%r, np.float32)" %
             _parse_local_table(hfadj, "limGain", 4,
                                must_contain="1e10"))

with open(OUT, "w") as f:
    f.write("\n".join(lines) + "\n")
print(f"wrote {OUT} ({os.path.getsize(OUT)} bytes)")
