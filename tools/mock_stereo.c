/* Mock libnslstereo: the API surface the reference driver uses
 * (src/rcv/stereo/stereo.c + src/sdrrcv.c), filling the exported
 * STEREO_dataBuffer with a deterministic byte stream so
 * gnsslib_tpu/io/stereo.py's ctypes binding is testable without USB
 * hardware.  Build:
 *
 *   gcc -shared -fPIC -O2 -o libmock_stereo.so tools/mock_stereo.c
 *
 * Behavior:
 *  - STEREO_PKT_SIZE = 8192 (exported const, like the vendor library);
 *  - STEREO_RefillDataBuffer fills STEREO_dataBuffer with the u8 LCG
 *    x_{n+1} = (1103515245 x_n + 12345) mod 2^31, byte = (x>>16) & 0xff,
 *    seeded to 1 by STEREO_GrabStart, paced at 26 Msps (1 byte/sample);
 *  - MOCK_STEREO_OVERRUN_AFTER=N makes the N+1-th refill return -1
 *    (USB overrun) so the fatal-overrun path is testable;
 *  - MOCK_STEREO_DISCONNECTED=1 makes STEREO_IsConnected return 0.
 */
#include <stdint.h>
#include <stdlib.h>
#include <time.h>

const uint32_t STEREO_PKT_SIZE = 8192;
const uint32_t STEREO_NUM_BLKS = 16;
uint8_t STEREO_dataBuffer[8192];

static uint32_t g_lcg = 1;
static int g_init = 0, g_grab = 0;
static long g_refills = 0;

int mock_stereo_get_grab(void) { return g_grab; }
long mock_stereo_get_refills(void) { return g_refills; }

int STEREO_InitLibrary(void) { g_init = 1; return 0; }
void STEREO_QuitLibrary(void) { g_init = 0; }

int STEREO_IsConnected(void)
{
    const char *d = getenv("MOCK_STEREO_DISCONNECTED");
    if (d && *d == '1') return 0;
    return g_init;
}

int STEREO_GrabInit(void) { return g_init ? 0 : -1; }

int STEREO_GrabStart(void)
{
    if (!g_init) return -1;
    g_grab = 1;
    g_lcg = 1;                           /* deterministic stream start */
    g_refills = 0;
    return 0;
}

int STEREO_RefillDataBuffer(void)
{
    uint32_t i;
    struct timespec ts;
    const char *ov = getenv("MOCK_STEREO_OVERRUN_AFTER");

    if (!g_grab) return -1;
    if (ov && *ov && g_refills >= atol(ov)) return -1;
    for (i = 0; i < STEREO_PKT_SIZE; i++) {
        g_lcg = (1103515245u * g_lcg + 12345u) & 0x7fffffffu;
        STEREO_dataBuffer[i] = (uint8_t)((g_lcg >> 16) & 0xffu);
    }
    g_refills++;
    /* pace at 26 Msps, 1 byte/sample (the board's fixed ADC clock) */
    ts.tv_sec = 0;
    ts.tv_nsec = (long)(STEREO_PKT_SIZE / 26e6 * 1e9);
    nanosleep(&ts, NULL);
    return 0;
}

int STEREO_GrabStop(void) { g_grab = 0; return 0; }
void STEREO_GrabClean(void) {}
