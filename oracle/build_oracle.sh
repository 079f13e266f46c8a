#!/bin/bash
# Build the C reference (wexiangis/wmix, mounted read-only at /root/reference)
# into parity-oracle shared libraries used ONLY by the test suite.
#
# Nothing from the reference is copied into this repo: its sources are
# compiled in place from $REF, and all build artifacts land in $ORACLE
# (gitignored).  The engine geometry (WMIX_CHN/WMIX_FREQ) is a compile-time
# constant in the reference, so one .so is produced per geometry:
#
#   $ORACLE/liboracle_<chn>x<freq>.so
#
# each containing the full reference core (null HAL), the vendored webrtc
# DSP modules, codec libs, and the flat-C shim from shim.c.
set -e

REF=${REF:-/root/reference}
HERE="$(cd "$(dirname "$0")" && pwd)"
ORACLE=${ORACLE:-$(dirname "$HERE")/.oracle}
INSTALL=$ORACLE/install
GEOMETRIES=${GEOMETRIES:-"1x8000 1x16000 2x16000 1x32000 2x44100"}

mkdir -p "$ORACLE" "$INSTALL/lib" "$INSTALL/include"
cd "$ORACLE"

# ---- 1. vendored webrtc DSP modules (vad/ns/aec/aecm/agc) ----
if [ ! -f "$INSTALL/lib/libwebrtcvad.so" ]; then
  tar -xzf "$REF/pkg/webrtc_cut.tar.gz"
  ( cd webrtc_cut
    for s in vad ns aec aecm agc; do bash ./build_${s}_so.sh gcc; done
    cp -r install/* "$INSTALL/" )
  rm -rf webrtc_cut
fi

# ---- 2. libmad (mp3 decode) ----
if [ ! -f "$INSTALL/lib/libmad.so" ]; then
  tar -xzf "$REF/pkg/libmad-0.15.1b.tar.gz"
  ( cd libmad-0.15.1b
    ./configure --prefix="$INSTALL" --enable-speed
    sed -i 's/-fforce-mem//g' Makefile
    make -j8 && make install )
  rm -rf libmad-0.15.1b
fi

# ---- 3. libfaac (aac encode) ----
if [ ! -f "$INSTALL/lib/libfaac.so" ]; then
  tar -xzf "$REF/pkg/faac-1.29.9.2.tar.gz"
  ( cd faac-1.29.9.2 && ./configure --prefix="$INSTALL" && make -j8 && make install )
  rm -rf faac-1.29.9.2
fi

# ---- 4. libfaad2 (aac decode) ----
if [ ! -f "$INSTALL/lib/libfaad.so" ]; then
  tar -xzf "$REF/pkg/faad2-2.8.8.tar.gz"
  ( cd faad2-2.8.8 && ./configure --prefix="$INSTALL" && make -j8 && make install )
  rm -rf faad2-2.8.8
fi

# ---- 4b. keep an extracted webrtc source tree for shim introspection ----
if [ ! -d "$ORACLE/src_webrtc/webrtc_cut" ]; then
  mkdir -p "$ORACLE/src_webrtc"
  tar -xzf "$REF/pkg/webrtc_cut.tar.gz" -C "$ORACLE/src_webrtc"
fi

# ---- 4c. C-only AEC lib: same sources as build_aec_so.sh but with a CPU
# stub instead of cpu_features.cc, so the portable C kernels run (the
# reference's embedded ARM targets use these; SSE2 reorders float sums) ----
if [ ! -f "$INSTALL/lib/libwebrtcaec_c.so" ]; then
  WCUT="$ORACLE/src_webrtc/webrtc_cut"
  AEC_SRC=$(ls "$WCUT"/webrtc/modules/audio_processing/aec/*.c \
            "$WCUT"/webrtc/modules/audio_processing/utility/*.c \
            "$WCUT"/webrtc/common_audio/*.c \
            "$WCUT"/webrtc/common_audio/signal_processing/*.c 2>/dev/null | \
            grep -v -E "mips|neon|armv7|sse2")
  gcc -fPIC -shared -o "$INSTALL/lib/libwebrtcaec_c.so" \
    $AEC_SRC "$HERE"/cpu_stub.c \
    -I"$WCUT" -DWEBRTC_POSIX -lpthread -lm
fi

# ---- 4d. libmad internals probes (-Dstatic=) for the MP3 decoder's
# per-function parity tests ----
if [ ! -f "$ORACLE/libmad_probe_l3.so" ]; then
  rm -rf "$ORACLE/madsrc" && mkdir -p "$ORACLE/madsrc"
  tar -xzf "$REF/pkg/libmad-0.15.1b.tar.gz" -C "$ORACLE/madsrc"
  ( cd "$ORACLE/madsrc/libmad-0.15.1b"
    ./configure --enable-speed >/dev/null 2>&1 || true
    gcc -fPIC -shared -o "$ORACLE/libmad_probe_l3.so" -Dstatic= -Dinline= \
      layer3.c huffman.c bit.c fixed.c -DFPM_DEFAULT -DOPT_SPEED \
      -DHAVE_CONFIG_H -I.
    gcc -fPIC -shared -o "$ORACLE/libmad_probe_synth.so" -Dstatic= -Dinline= \
      synth.c fixed.c -DFPM_DEFAULT -DOPT_SPEED -DHAVE_CONFIG_H -I. )
fi
if [ ! -f "$ORACLE/libmad_probe_l12.so" ]; then
  ( cd "$ORACLE/madsrc/libmad-0.15.1b"
    gcc -fPIC -shared -o "$ORACLE/libmad_probe_l12.so" -Dstatic= -Dinline= \
      layer12.c bit.c fixed.c -DFPM_DEFAULT -DOPT_SPEED -DHAVE_CONFIG_H -I. )
fi

# ---- 4e. faad2/faac internals probes (-Dstatic=) for the AAC codec's
# per-stage parity tests (same method as the libmad probes) ----
if [ ! -f "$ORACLE/libfaad_probe.so" ]; then
  rm -rf "$ORACLE/faadsrc" && mkdir -p "$ORACLE/faadsrc"
  tar -xzf "$REF/pkg/faad2-2.8.8.tar.gz" -C "$ORACLE/faadsrc"
  ( cd "$ORACLE/faadsrc/faad2-2.8.8"
    ./configure >/dev/null 2>&1 || true
    cd libfaad
    # LC-only probe (the wmix fixtures are plain AAC-LC; SBR/PS would pull
    # in dozens more files): unity build so -Dstatic= can't create
    # duplicate symbols from header-inline helpers
    sed -i 's|^#define SBR_DEC|//#define SBR_DEC|; s|^#define PS_DEC|//#define PS_DEC|' common.h
    # neutralize INLINE: plain C99 `inline` without static emits no extern
    # definition, leaving undefined symbols in the -Dstatic= probe
    sed -i 's|^#define INLINE __inline$|#define INLINE|; s|^#define INLINE inline$|#define INLINE|' common.h
    cat > _probe_unity.c <<'UNITY'
#include "bits.c"
#include "common.c"
#include "decoder.c"
#include "syntax.c"
#include "specrec.c"
#include "huffman.c"
#include "pulse.c"
#include "tns.c"
#include "ms.c"
#include "is.c"
#include "pns.c"
#include "filtbank.c"
#include "mdct.c"
#include "cfft.c"
#include "output.c"
#include "drc.c"
#include "error.c"
#include "mp4.c"
UNITY
    gcc -fPIC -shared -o "$ORACLE/libfaad_probe.so" -Dstatic= \
      -DLC_ONLY_DECODER _probe_unity.c \
      -I. -I../include -DHAVE_CONFIG_H -I.. -lm 2> "$ORACLE/faad_probe.log" \
      || echo "faad probe build failed (see faad_probe.log)" )
fi
if [ ! -f "$ORACLE/libfaac_probe.so" ]; then
  rm -rf "$ORACLE/faacsrc" && mkdir -p "$ORACLE/faacsrc"
  tar -xzf "$REF/pkg/faac-1.29.9.2.tar.gz" -C "$ORACLE/faacsrc"
  ( cd "$ORACLE/faacsrc"/faac-*
    ./configure >/dev/null 2>&1 || true
    cd libfaac
    gcc -fPIC -shared -o "$ORACLE/libfaac_probe.so" -Dstatic= \
      *.c -I. -I../include -DHAVE_CONFIG_H -I.. -lm \
      2> "$ORACLE/faac_probe.log" \
      || echo "faac probe build failed (see faac_probe.log)" )
fi

# ---- 4e2. faad2 SBR+PS probe (-Dstatic= unity WITH SBR_DEC/PS_DEC)
# for the HE-AAC v2 decode path's per-stage parity tests ----
if [ ! -f "$ORACLE/libfaad_sbr_probe.so" ]; then
  rm -rf "$ORACLE/faadsbrsrc" && mkdir -p "$ORACLE/faadsbrsrc"
  tar -xzf "$REF/pkg/faad2-2.8.8.tar.gz" -C "$ORACLE/faadsbrsrc"
  ( cd "$ORACLE/faadsbrsrc/faad2-2.8.8"
    ./configure >/dev/null 2>&1 || true
    cd libfaad
    sed -i 's|^#define INLINE __inline$|#define INLINE|; s|^#define INLINE inline$|#define INLINE|' common.h
    cat > _probe_unity.c <<'UNITY'
#include "bits.c"
#include "common.c"
#include "decoder.c"
#include "syntax.c"
#include "specrec.c"
#include "huffman.c"
#include "pulse.c"
#include "tns.c"
#include "ms.c"
#include "is.c"
#include "pns.c"
#include "filtbank.c"
#include "mdct.c"
#include "cfft.c"
#include "output.c"
#include "drc.c"
#include "error.c"
#include "mp4.c"
#include "hcr.c"
#include "rvlc.c"
#include "ic_predict.c"
#include "lt_predict.c"
#include "ssr.c"
#include "ssr_fb.c"
#include "ssr_ipqf.c"
#include "sbr_dec.c"
#include "sbr_syntax.c"
#include "sbr_huff.c"
#include "sbr_qmf.c"
#include "sbr_dct.c"
#include "sbr_fbt.c"
#include "sbr_tf_grid.c"
#include "sbr_e_nf.c"
#include "sbr_hfgen.c"
#include "sbr_hfadj.c"
#include "ps_dec.c"
#include "ps_syntax.c"
UNITY
    gcc -fPIC -shared -o "$ORACLE/libfaad_sbr_probe.so" -Dstatic= \
      _probe_unity.c \
      -I. -I../include -DHAVE_CONFIG_H -I.. -lm \
      2> "$ORACLE/faad_sbr_probe.log" \
      || echo "faad sbr probe build failed (see faad_sbr_probe.log)" )
fi

# ---- 4f. speex-1.2beta3 echo canceller probe (float build) for the
# Speex alternate AEC backend's parity tests (src/speexType.c) ----
if [ ! -f "$ORACLE/libspeex_probe.so" ]; then
  rm -rf "$ORACLE/spxsrc" && mkdir -p "$ORACLE/spxsrc"
  tar -xzf "$REF/pkg/speex-1.2beta3.tar.gz" -C "$ORACLE/spxsrc"
  ( cd "$ORACLE/spxsrc"/speex-1.2beta3
    ./configure >/dev/null 2>&1 || true
    cd libspeex
    cat > _probe_unity.c <<'UNITY'
#include "mdf.c"
#include "fftwrap.c"
#include "smallft.c"
UNITY
    gcc -fPIC -shared -o "$ORACLE/libspeex_probe.so" -Dstatic= \
      -D'inline=' _probe_unity.c -DUSE_SMALLFT -DEXPORT= -I. \
      -I../include -DHAVE_CONFIG_H -I.. -lm \
      2> "$ORACLE/speex_probe.log" \
      || echo "speex probe build failed (see speex_probe.log)" )
fi

# ---- 4g. AECM probe (-Dstatic= unity over aecm + delay estimator,
# spl compiled normally) for the mobile-AEC backend's parity tests ----
if [ ! -f "$ORACLE/libaecm_probe.so" ]; then
  WCUT="$ORACLE/src_webrtc/webrtc_cut"
  ( cd "$WCUT"
    BD=$(mktemp -d)
    cat > "$BD/unity.c" <<'UNITY'
#include "webrtc/modules/audio_processing/aecm/aecm_core.c"
#include "webrtc/modules/audio_processing/aecm/aecm_core_c.c"
#include "webrtc/modules/audio_processing/aecm/echo_control_mobile.c"
#include "webrtc/modules/audio_processing/utility/delay_estimator.c"
#include "webrtc/modules/audio_processing/utility/delay_estimator_wrapper.c"
UNITY
    gcc -fPIC -c -o "$BD/unity.o" -Dstatic= -D'__inline=' "$BD/unity.c" \
      -I. -DWEBRTC_POSIX
    for f in $(ls webrtc/common_audio/signal_processing/*.c | \
               grep -vE "mips|neon|armv7") webrtc/common_audio/ring_buffer.c
    do
      gcc -fPIC -c -o "$BD/$(basename $f .c).o" "$f" -I. -DWEBRTC_POSIX
    done
    gcc -fPIC -shared -o "$ORACLE/libaecm_probe.so" "$BD"/*.o -lm
    rm -rf "$BD" )
fi

# ---- 4h. NSX probe (-Dstatic= unity over nsx_core*, spl compiled
# normally) for the fixed-point NS backend's parity tests ----
if [ ! -f "$ORACLE/libnsx_probe.so" ]; then
  WCUT="$ORACLE/src_webrtc/webrtc_cut"
  ( cd "$WCUT"
    BD=$(mktemp -d)
    cat > "$BD/unity.c" <<'UNITY'
#include "webrtc/modules/audio_processing/ns/nsx_core.c"
#include "webrtc/modules/audio_processing/ns/nsx_core_c.c"
#include "webrtc/modules/audio_processing/ns/noise_suppression_x.c"
UNITY
    gcc -fPIC -c -o "$BD/unity.o" -Dstatic= -D'__inline=' "$BD/unity.c" \
      -I. -DWEBRTC_POSIX
    for f in $(ls webrtc/common_audio/signal_processing/*.c | \
               grep -vE "mips|neon|armv7")
    do
      gcc -fPIC -c -o "$BD/$(basename $f .c).o" "$f" -I. -DWEBRTC_POSIX
    done
    gcc -fPIC -shared -o "$ORACLE/libnsx_probe.so" "$BD"/*.o -lm
    rm -rf "$BD" )
fi

# ---- 5. reference core + shim, one .so per engine geometry ----
for geom in $GEOMETRIES; do
  chn=${geom%x*}
  freq=${geom#*x}
  out="$ORACLE/liboracle_${chn}x${freq}.so"
  [ -f "$out" ] && continue
  gcc -fPIC -shared -o "$out" \
    "$REF"/src/wmix.c "$REF"/src/wmixTask.c "$REF"/src/wmixMem.c \
    "$REF"/src/wav.c "$REF"/src/delay.c "$REF"/src/g711codec.c \
    "$REF"/src/rtp.c "$REF"/src/webrtc.c "$REF"/src/mp3Type.c \
    "$REF"/src/aacType.c "$REF"/src/speexType.c "$REF"/math/fft.c \
    "$REF"/ui/bmp.c "$REF"/ui/fbmap.c "$REF"/ui/wave.c \
    "$HERE"/plat_oracle/plat.c "$HERE"/shim.c "$HERE"/cpu_stub.c \
    -I"$HERE"/plat_oracle -I"$REF"/src -I"$REF"/math -I"$REF"/ui \
    -I"$INSTALL"/include \
    -I"$ORACLE"/src_webrtc/webrtc_cut \
    -L"$INSTALL"/lib -Wl,-rpath,"$INSTALL"/lib \
    -DORACLE_CHN="$chn" -DORACLE_FREQ="$freq" \
    -DMAKE_MP3=1 -DMAKE_AAC=1 -DMAKE_WEBRTC_VAD=1 -DMAKE_WEBRTC_AEC=1 \
    -DMAKE_WEBRTC_NS=1 -DMAKE_WEBRTC_AGC=1 -DMAKE_SPEEX=0 -DMAKE_SPEEX_BETA3=0 \
    -DMAKE_MATH_FFT=1024 -DMAKE_MATH_UI=0 \
    -lwebrtcvad -lwebrtcaec_c -lwebrtcaecm -lwebrtcns -lwebrtcagc \
    -lmad -lfaac -lfaad -lm -lpthread
  echo "built $out"
done

# ---- 5a. t31-geometry oracle: the Ingenic hardware-AEC platform's
# degenerate timing (AEC_INTERVALMS=0, PLAY_CORRECT=0,
# /root/reference/platform/t31/plat.h:10-16) over the same null HAL ----
out="$ORACLE/liboracle_t31_1x8000.so"
if [ ! -f "$out" ]; then
  gcc -fPIC -shared -o "$out" \
    "$REF"/src/wmix.c "$REF"/src/wmixTask.c "$REF"/src/wmixMem.c \
    "$REF"/src/wav.c "$REF"/src/delay.c "$REF"/src/g711codec.c \
    "$REF"/src/rtp.c "$REF"/src/webrtc.c "$REF"/src/mp3Type.c \
    "$REF"/src/aacType.c "$REF"/src/speexType.c "$REF"/math/fft.c \
    "$REF"/ui/bmp.c "$REF"/ui/fbmap.c "$REF"/ui/wave.c \
    "$HERE"/plat_oracle/plat.c "$HERE"/shim.c "$HERE"/cpu_stub.c \
    -I"$HERE"/plat_oracle -I"$REF"/src -I"$REF"/math -I"$REF"/ui \
    -I"$INSTALL"/include \
    -I"$ORACLE"/src_webrtc/webrtc_cut \
    -L"$INSTALL"/lib -Wl,-rpath,"$INSTALL"/lib \
    -DORACLE_CHN=1 -DORACLE_FREQ=8000 \
    -DORACLE_AECMS=0 -DORACLE_PLAYCORRECT=0 \
    -DMAKE_MP3=1 -DMAKE_AAC=1 -DMAKE_WEBRTC_VAD=1 -DMAKE_WEBRTC_AEC=1 \
    -DMAKE_WEBRTC_NS=1 -DMAKE_WEBRTC_AGC=1 -DMAKE_SPEEX=0 -DMAKE_SPEEX_BETA3=0 \
    -DMAKE_MATH_FFT=1024 -DMAKE_MATH_UI=0 \
    -lwebrtcvad -lwebrtcaec_c -lwebrtcaecm -lwebrtcns -lwebrtcagc \
    -lmad -lfaac -lfaad -lm -lpthread
  echo "built $out"
fi

# ---- 5b. integer-DSP chain oracle: the reference's NSX + AECM switches
# (src/webrtc.c:173 "#undef MAKE_WEBRTC_AEC // do this switch to AECM",
# :512 "#define MAKE_WEBRTC_NSX // define this switch to NSX").  The AECM
# switch is an in-file #undef between the outer #if and the inner #ifdef,
# so a sed-patched copy of webrtc.c (in the gitignored build dir, never
# the repo) stands in for the manual edit the reference instructs.
for geom in 1x16000 1x8000; do
  chn=${geom%x*}
  freq=${geom#*x}
  out="$ORACLE/liboracle_intdsp_${chn}x${freq}.so"
  [ -f "$out" ] && continue
  sed 's|^// #undef MAKE_WEBRTC_AEC|#undef MAKE_WEBRTC_AEC|' \
    "$REF"/src/webrtc.c > "$ORACLE/webrtc_intdsp.c"
  gcc -fPIC -shared -o "$out" \
    "$REF"/src/wmix.c "$REF"/src/wmixTask.c "$REF"/src/wmixMem.c \
    "$REF"/src/wav.c "$REF"/src/delay.c "$REF"/src/g711codec.c \
    "$REF"/src/rtp.c "$ORACLE"/webrtc_intdsp.c "$REF"/src/mp3Type.c \
    "$REF"/src/aacType.c "$REF"/src/speexType.c "$REF"/math/fft.c \
    "$REF"/ui/bmp.c "$REF"/ui/fbmap.c "$REF"/ui/wave.c \
    "$HERE"/plat_oracle/plat.c "$HERE"/shim.c "$HERE"/cpu_stub.c \
    -I"$HERE"/plat_oracle -I"$REF"/src -I"$REF"/math -I"$REF"/ui \
    -I"$INSTALL"/include \
    -I"$ORACLE"/src_webrtc/webrtc_cut \
    -L"$INSTALL"/lib -Wl,-rpath,"$INSTALL"/lib \
    -DORACLE_CHN="$chn" -DORACLE_FREQ="$freq" \
    -DMAKE_MP3=1 -DMAKE_AAC=1 -DMAKE_WEBRTC_VAD=1 -DMAKE_WEBRTC_AEC=1 \
    -DMAKE_WEBRTC_NSX \
    -DMAKE_WEBRTC_NS=1 -DMAKE_WEBRTC_AGC=1 -DMAKE_SPEEX=0 -DMAKE_SPEEX_BETA3=0 \
    -DMAKE_MATH_FFT=1024 -DMAKE_MATH_UI=0 \
    -lwebrtcvad -lwebrtcaec_c -lwebrtcaecm -lwebrtcns -lwebrtcagc \
    -lmad -lfaac -lfaad -lm -lpthread
  echo "built $out"
done

echo "oracle build complete"
