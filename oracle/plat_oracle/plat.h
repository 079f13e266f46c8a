/*
 * Parameterized null platform for the oracle build.
 * Same 10-function contract as the reference HALs (see
 * /root/reference/platform/alsa/plat.h:23-36), but with the compile-time
 * geometry injected via -DORACLE_CHN / -DORACLE_FREQ so the reference core
 * can be compiled at several engine geometries for parity testing.
 */
#ifndef _PLAT_H_
#define _PLAT_H_

#include <stdint.h>

#ifndef ORACLE_CHN
#define ORACLE_CHN 1
#endif
#ifndef ORACLE_FREQ
#define ORACLE_FREQ 8000
#endif

#define PLAT_CHN ORACLE_CHN
#define PLAT_SAMPLE 16
#define PLAT_FREQ ORACLE_FREQ
/* echo-path delay; alsa default 400 ms, t31 hardware-AEC geometry 0
 * (platform/t31/plat.h:14) — overridable for per-platform parity */
#ifndef ORACLE_AECMS
#define ORACLE_AECMS 400
#endif
#define PLAT_AEC_INTERVALMS ORACLE_AECMS
/* write-ahead placement of the mix cursor: alsa 0.2 s formula; t31 0 */
#ifndef ORACLE_PLAYCORRECT
#define ORACLE_PLAYCORRECT (PLAT_CHN * PLAT_FREQ * 16 / 8 / 5)
#endif
#define PLAT_PLAY_CORRECT ORACLE_PLAYCORRECT

void *plat_ao_init(int chn, int freq);
void *plat_ai_init(int chn, int freq);

int plat_ao_write(void *objAo, uint8_t *data, int len);
int plat_ai_read(void *objAi, uint8_t *data, int len);

void plat_ao_vol_set(void *objAo, int vol);
void plat_ai_vol_set(void *objAi, int vol);

int plat_ao_vol_get(void *objAo);
int plat_ai_vol_get(void *objAi);

void plat_ao_exit(void *objAo);
void plat_ai_exit(void *objAi);

#endif
