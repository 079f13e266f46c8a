/* CPU-feature stub for the oracle AEC build: reports no SIMD so the
 * dispatchers (aec_rdft_init, WebRtcAec_InitAec) select the portable C
 * kernels — the same paths the reference runs on its embedded ARM
 * targets.  (The x86 SSE2 kernels reorder float summations, so they are
 * not bit-comparable with the C reference semantics.)
 *
 * NB WebRtc_GetCPUInfo is declared as a function POINTER variable
 * (cpu_features_wrapper.h:37), so the stub must be one too. */
#include <stdint.h>

static int no_simd(int feature)
{
    (void)feature;
    return 0;
}

int (*WebRtc_GetCPUInfo)(int) = no_simd;
int (*WebRtc_GetCPUInfoNoASM)(int) = no_simd;

uint64_t WebRtc_GetCPUFeaturesARM(void)
{
    return 0;
}

/* SSE2 initializers referenced under WEBRTC_ARCH_X86_FAMILY; never called
 * because WebRtc_GetCPUInfo reports no SSE2 above. */
void aec_rdft_init_sse2(void) {}
void WebRtcAec_InitAec_SSE2(void) {}
