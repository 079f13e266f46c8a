/*
 * Oracle shim: flat-C entry points over the reference core so the pytest
 * parity suite can drive it via ctypes.  Compiled together with the
 * reference sources (read from /root/reference, never copied) at a given
 * engine geometry (see build_oracle.sh / plat_oracle/plat.h).
 *
 * Reference entry points exercised:
 *   - wmix_load_data (the mixer hot loop, src/wmix.c:1639)
 *   - wmix_pcm_zoom / wmix_len_of_* (resampler, src/wmix.c:49-222)
 *   - mp3 decode via libmad (same driver pattern as src/wmixTask.c:2022)
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <stdint.h>

#include "wmix.h"

/* geometry probe: {chn, sample, freq, aec_intervalms, view_play_correct,
 *                  buff_size, pkg_size, frame_num} */
void shim_geometry(int32_t out[8])
{
    out[0] = WMIX_CHN;
    out[1] = WMIX_SAMPLE;
    out[2] = WMIX_FREQ;
    out[3] = AEC_INTERVALMS;
    out[4] = VIEW_PLAY_CORRECT;
    out[5] = WMIX_BUFF_SIZE;
    out[6] = WMIX_PKG_SIZE;
    out[7] = WMIX_FRAME_NUM;
}

/*
 * Drive wmix_load_data against a caller-provided ring buffer.
 *
 *   ring        : uint8[WMIX_BUFF_SIZE + 4], caller-owned ring state
 *   headOff     : byte offset of this stream's write head into ring,
 *                 or -1 to pass a NULL head (first call)
 *   wmixHeadOff : byte offset of the daemon's play-write head (wmix->head)
 *   wmixTick    : daemon's global tick (wmix->tick)
 *   reduceMode  : current global background-reduce mode (wmix->reduceMode)
 *   src,srcLen  : source PCM bytes
 *   freq,chn,sample,reduce : stream format + its own reduce setting
 *   tick        : in/out, this stream's tick
 *   returns new headOff (byte offset into ring), or -2 on early return
 */
int64_t shim_load_data(
    uint8_t *ring,
    int64_t headOff, uint32_t wmixHeadOff, uint32_t wmixTick,
    uint8_t reduceMode,
    uint8_t *src, uint32_t srcLen,
    uint16_t freq, uint8_t chn, uint8_t sample, uint8_t reduce,
    uint32_t *tick)
{
    WMix_Struct w;
    WMix_Point srcP, headP, ret;

    memset(&w, 0, sizeof(w));
    w.run = true;
    w.buff = ring;
    w.start.U8 = ring;
    w.end.U8 = ring + WMIX_BUFF_SIZE;
    w.head.U8 = ring + wmixHeadOff;
    w.tail.U8 = ring + WMIX_BUFF_SIZE;
    w.tick = wmixTick;
    w.reduceMode = reduceMode;

    srcP.U8 = src;
    headP.U8 = (headOff < 0) ? NULL : ring + headOff;

    ret = wmix_load_data(&w, srcP, srcLen, freq, chn, sample, headP, reduce, tick);
    if (!ret.U8)
        return -2;
    return (int64_t)(ret.U8 - ring);
}

/* ---------------- NS state introspection (for parity debugging) ------- */
#include "webrtc/modules/audio_processing/ns/ns_core.h"

/* Copy a field of NoiseSuppressionC into out; returns element count. */
int shim_ns_dump(void *handle, const char *field, float *out, int cap)
{
    NoiseSuppressionC *s = (NoiseSuppressionC *)handle;
    int i, n = 0;
#define CPYF(name, len) \
    if (!strcmp(field, #name)) { n = (len); for (i = 0; i < n && i < cap; i++) out[i] = s->name[i]; return n; }
#define CPYS(name) \
    if (!strcmp(field, #name)) { out[0] = (float)s->name; return 1; }
    CPYF(noise, HALF_ANAL_BLOCKL)
    CPYF(noisePrev, HALF_ANAL_BLOCKL)
    CPYF(magnPrevAnalyze, HALF_ANAL_BLOCKL)
    CPYF(magnPrevProcess, HALF_ANAL_BLOCKL)
    CPYF(magnAvgPause, HALF_ANAL_BLOCKL)
    CPYF(initMagnEst, HALF_ANAL_BLOCKL)
    CPYF(parametricNoise, HALF_ANAL_BLOCKL)
    CPYF(smooth, HALF_ANAL_BLOCKL)
    CPYF(speechProb, HALF_ANAL_BLOCKL)
    CPYF(logLrtTimeAvg, HALF_ANAL_BLOCKL)
    CPYF(quantile, HALF_ANAL_BLOCKL)
    CPYF(lquantile, SIMULT * HALF_ANAL_BLOCKL)
    CPYF(density, SIMULT * HALF_ANAL_BLOCKL)
    CPYF(featureData, 7)
    CPYF(priorModelPars, 7)
    CPYF(analyzeBuf, ANAL_BLOCKL_MAX)
    CPYF(dataBuf, ANAL_BLOCKL_MAX)
    CPYF(syntBuf, ANAL_BLOCKL_MAX)
    CPYS(whiteNoiseLevel)
    CPYS(pinkNoiseNumerator)
    CPYS(pinkNoiseExp)
    CPYS(priorSpeechProb)
    CPYS(signalEnergy)
    CPYS(sumMagn)
    CPYS(blockInd)
    CPYS(updates)
    if (!strcmp(field, "counter")) {
        for (i = 0; i < SIMULT; i++) out[i] = (float)s->counter[i];
        return SIMULT;
    }
    if (!strcmp(field, "histLrt")) {
        for (i = 0; i < HIST_PAR_EST && i < cap; i++) out[i] = (float)s->histLrt[i];
        return HIST_PAR_EST;
    }
    if (!strcmp(field, "modelUpdatePars")) {
        for (i = 0; i < 4; i++) out[i] = (float)s->modelUpdatePars[i];
        return 4;
    }
#undef CPYF
#undef CPYS
    return -1;
}

/* ---------------- mp3 decode oracle (libmad driver) ---------------- */
#if (MAKE_MP3)
#include <mad.h>

typedef struct
{
    const uint8_t *data;
    size_t len;
    int16_t *out;
    size_t outCap;   /* in samples */
    size_t outLen;   /* in samples (interleaved) */
    uint32_t freq;
    uint16_t chn;
    int done;
} ShimMp3;

static enum mad_flow shim_mp3_input(void *data, struct mad_stream *stream)
{
    ShimMp3 *m = (ShimMp3 *)data;
    if (m->done)
        return MAD_FLOW_STOP;
    m->done = 1;
    mad_stream_buffer(stream, m->data, m->len);
    return MAD_FLOW_CONTINUE;
}

/* round to 16 bits exactly as the reference does (src/wmixTask.c:1837-1845) */
static int16_t shim_mad_scale(mad_fixed_t sample)
{
    sample += (1L << (MAD_F_FRACBITS - 16));
    if (sample >= MAD_F_ONE)
        sample = MAD_F_ONE - 1;
    else if (sample < -MAD_F_ONE)
        sample = -MAD_F_ONE;
    return sample >> (MAD_F_FRACBITS + 1 - 16);
}

static enum mad_flow shim_mp3_output(void *data,
                                     struct mad_header const *header,
                                     struct mad_pcm *pcm)
{
    ShimMp3 *m = (ShimMp3 *)data;
    unsigned int i;
    (void)header;
    m->freq = pcm->samplerate;
    m->chn = pcm->channels;
    for (i = 0; i < pcm->length; i++)
    {
        if (m->outLen + pcm->channels > m->outCap)
            return MAD_FLOW_STOP;
        m->out[m->outLen++] = shim_mad_scale(pcm->samples[0][i]);
        if (pcm->channels == 2)
            m->out[m->outLen++] = shim_mad_scale(pcm->samples[1][i]);
    }
    return MAD_FLOW_CONTINUE;
}

static enum mad_flow shim_mp3_error(void *data, struct mad_stream *stream,
                                    struct mad_frame *frame)
{
    (void)data; (void)stream; (void)frame;
    return MAD_FLOW_CONTINUE;
}

/* decode an mp3 buffer to int16 PCM; returns sample count, fills freq/chn */
int64_t shim_mp3_decode(const uint8_t *data, int64_t len,
                        int16_t *out, int64_t outCap,
                        uint32_t *freq, uint16_t *chn)
{
    ShimMp3 m = {data, (size_t)len, out, (size_t)outCap, 0, 0, 0, 0};
    struct mad_decoder decoder;
    mad_decoder_init(&decoder, &m, shim_mp3_input, 0, 0, shim_mp3_output,
                     shim_mp3_error, 0);
    mad_decoder_run(&decoder, MAD_DECODER_MODE_SYNC);
    mad_decoder_finish(&decoder);
    *freq = m.freq;
    *chn = m.chn;
    return (int64_t)m.outLen;
}
#endif

/* ---- AEC state introspection (debug only) --------------------------------
 * Reaches through the daemon handle (src/webrtc.c Aec_Struct, whose first
 * member is the WebRtcAec instance pointer) into the internal structs
 * (echo_cancellation_internal.h / aec_core_internal.h) so the parity suite
 * can localise a divergence to a specific counter or buffer cursor. */
#if MAKE_WEBRTC_AEC
#include "webrtc/modules/audio_processing/aec/echo_cancellation_internal.h"
#include "webrtc/modules/audio_processing/aec/aec_core_internal.h"

void shim_aec_state(void *fp, int32_t out[32])
{
    Aec *pc = *(Aec **)fp;
    AecCore *c = pc->aec;
    out[0] = pc->startup_phase;
    out[1] = pc->checkBuffSize;
    out[2] = pc->counter;
    out[3] = pc->checkBufSizeCtr;
    out[4] = pc->bufSizeStart;
    out[5] = pc->knownDelay;
    out[6] = pc->filtDelay;
    out[7] = pc->timeForDelayChange;
    out[8] = pc->lastDelayDiff;
    out[9] = (int32_t)WebRtc_available_read(pc->far_pre_buf);
    out[10] = c->system_delay;
    out[11] = c->knownDelay;
    out[12] = c->xfBufBlockPos;
    out[13] = c->noiseEstCtr;
    out[14] = c->delayEstCtr;
    out[15] = (int32_t)c->seed;
    out[16] = c->divergeState;
    out[17] = (int32_t)WebRtc_available_read(c->far_buf);
    out[18] = (int32_t)WebRtc_available_read(c->nearFrBuf);
    out[19] = (int32_t)WebRtc_available_read(c->outFrBuf);
    out[20] = c->hNlNewMin;
    out[21] = c->hNlMinCtr;
    out[22] = c->delayIdx;
    out[23] = c->stNearState;
    out[24] = c->echoState;
    out[25] = pc->sum;
    out[26] = pc->firstVal;
}

/* which: 0 xPow, 1 dPow, 2 dMinPow, 3 sd, 4 se, 5 sx, 6 hNs, 7 outBuf(64),
 * 8 dBuf(128), 9 eBuf(128), 10 xfBuf re (12*65), 11 xfBuf im,
 * 12 wfBuf re, 13 wfBuf im, 14 xfwBuf interleaved (12*65*2),
 * 15 floats {hNlFbMin,hNlFbLocalMin,hNlXdAvgMin,overDrive,overDriveSm},
 * 16 sde interleaved (65*2), 17 sxd interleaved (65*2).
 * Returns element count written. */
int32_t shim_aec_arr(void *fp, int32_t which, float *out)
{
    Aec *pc = *(Aec **)fp;
    AecCore *c = pc->aec;
    switch (which) {
    case 0: memcpy(out, c->xPow, sizeof(float) * PART_LEN1); return PART_LEN1;
    case 1: memcpy(out, c->dPow, sizeof(float) * PART_LEN1); return PART_LEN1;
    case 2: memcpy(out, c->dMinPow, sizeof(float) * PART_LEN1); return PART_LEN1;
    case 3: memcpy(out, c->sd, sizeof(float) * PART_LEN1); return PART_LEN1;
    case 4: memcpy(out, c->se, sizeof(float) * PART_LEN1); return PART_LEN1;
    case 5: memcpy(out, c->sx, sizeof(float) * PART_LEN1); return PART_LEN1;
    case 6: memcpy(out, c->hNs, sizeof(float) * PART_LEN1); return PART_LEN1;
    case 7: memcpy(out, c->outBuf, sizeof(float) * PART_LEN); return PART_LEN;
    case 8: memcpy(out, c->dBuf, sizeof(float) * PART_LEN2); return PART_LEN2;
    case 9: memcpy(out, c->eBuf, sizeof(float) * PART_LEN2); return PART_LEN2;
    case 10: memcpy(out, c->xfBuf[0],
                    sizeof(float) * kExtendedNumPartitions * PART_LEN1);
             return kExtendedNumPartitions * PART_LEN1;
    case 11: memcpy(out, c->xfBuf[1],
                    sizeof(float) * kExtendedNumPartitions * PART_LEN1);
             return kExtendedNumPartitions * PART_LEN1;
    case 12: memcpy(out, c->wfBuf[0],
                    sizeof(float) * kExtendedNumPartitions * PART_LEN1);
             return kExtendedNumPartitions * PART_LEN1;
    case 13: memcpy(out, c->wfBuf[1],
                    sizeof(float) * kExtendedNumPartitions * PART_LEN1);
             return kExtendedNumPartitions * PART_LEN1;
    case 14: memcpy(out, c->xfwBuf,
                    sizeof(float) * kExtendedNumPartitions * PART_LEN1 * 2);
             return kExtendedNumPartitions * PART_LEN1 * 2;
    case 15:
        out[0] = c->hNlFbMin; out[1] = c->hNlFbLocalMin;
        out[2] = c->hNlXdAvgMin; out[3] = c->overDrive;
        out[4] = c->overDriveSm;
        return 5;
    case 16: memcpy(out, c->sde, sizeof(float) * PART_LEN1 * 2);
             return PART_LEN1 * 2;
    case 17: memcpy(out, c->sxd, sizeof(float) * PART_LEN1 * 2);
             return PART_LEN1 * 2;
    }
    return 0;
}
#endif
