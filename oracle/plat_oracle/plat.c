/* Null HAL for the oracle build: every function is a no-op (the same trick as
 * the reference's stub platform, /root/reference/platform/hi3516/plat.c). */
#include <stdio.h>
#include "plat.h"

void *plat_ao_init(int chn, int freq) { (void)chn; (void)freq; return NULL; }
void *plat_ai_init(int chn, int freq) { (void)chn; (void)freq; return NULL; }

int plat_ao_write(void *objAo, uint8_t *data, int len)
{ (void)objAo; (void)data; return len; }

int plat_ai_read(void *objAi, uint8_t *data, int len)
{ (void)objAi; (void)data; return len; }

void plat_ao_vol_set(void *objAo, int vol) { (void)objAo; (void)vol; }
void plat_ai_vol_set(void *objAi, int vol) { (void)objAi; (void)vol; }

int plat_ao_vol_get(void *objAo) { (void)objAo; return 10; }
int plat_ai_vol_get(void *objAi) { (void)objAi; return 10; }

void plat_ao_exit(void *objAo) { (void)objAo; }
void plat_ai_exit(void *objAi) { (void)objAi; }
