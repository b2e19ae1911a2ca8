/* Mock librtlsdr: the API surface the reference driver uses
 * (src/rcv/rtlsdr/rtlsdr.c + convenience.c), emitting a deterministic
 * byte stream so gnsslib_tpu/io/rtlsdr.py's ctypes binding is testable
 * without USB hardware.  Build:
 *
 *   gcc -shared -fPIC -O2 -o libmock_rtlsdr.so tools/mock_rtlsdr.c
 *
 * Behavior:
 *  - sample generator: u8 LCG  x_{n+1} = (1103515245 x_n + 12345) mod 2^31,
 *    byte n = (x_n >> 16) & 0xff, seeded to 1 by rtlsdr_reset_buffer —
 *    the Python test regenerates the same stream to verify byte-exact
 *    delivery through the async callback + ring;
 *  - optional file replay: set MOCK_RTLSDR_FILE to stream a capture
 *    instead (loops at EOF);
 *  - read_async paces transfers at the configured sample rate (2 bytes
 *    per sample) until rtlsdr_cancel_async;
 *  - every configuration setter records its value, exposed through
 *    mock_get_* getters so the test can assert the exact programming
 *    sequence the reference's rtlsdr_initconf performs.
 */
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <time.h>

typedef void (*rtlsdr_read_async_cb_t)(unsigned char *buf, uint32_t len,
                                       void *ctx);

static uint32_t g_rate = 2048000, g_freq;
static int g_gain_mode = -1, g_gain = 0, g_ppm = 0;
static int g_open = 0, g_reset = 0;
static volatile int g_cancel = 0;
static uint32_t g_lcg = 1;
static int g_marker = 0x52544c31;       /* "RTL1" mock device handle */

/* introspection for the test harness */
uint32_t mock_get_rate(void) { return g_rate; }
uint32_t mock_get_freq(void) { return g_freq; }
int mock_get_gain_mode(void) { return g_gain_mode; }
int mock_get_gain(void) { return g_gain; }
int mock_get_ppm(void) { return g_ppm; }
int mock_get_reset(void) { return g_reset; }

int rtlsdr_open(void **dev, uint32_t index)
{
    (void)index;
    *dev = &g_marker;
    g_open = 1;
    g_cancel = 0;
    return 0;
}

int rtlsdr_close(void *dev) { (void)dev; g_open = 0; return 0; }

int rtlsdr_set_sample_rate(void *dev, uint32_t rate)
{
    (void)dev;
    if (rate < 225001 || rate > 3200000) return -22;  /* librtlsdr EINVAL */
    g_rate = rate;
    return 0;
}

int rtlsdr_set_center_freq(void *dev, uint32_t freq)
{
    (void)dev; g_freq = freq; return 0;
}

int rtlsdr_set_tuner_gain_mode(void *dev, int mode)
{
    (void)dev; g_gain_mode = mode; return 0;
}

int rtlsdr_set_tuner_gain(void *dev, int gain)
{
    (void)dev; g_gain = gain; return 0;
}

int rtlsdr_set_freq_correction(void *dev, int ppm)
{
    (void)dev; g_ppm = ppm; return 0;
}

int rtlsdr_reset_buffer(void *dev)
{
    (void)dev;
    g_reset = 1;
    g_lcg = 1;                           /* deterministic stream start */
    return 0;
}

int rtlsdr_cancel_async(void *dev) { (void)dev; g_cancel = 1; return 0; }

int rtlsdr_read_async(void *dev, rtlsdr_read_async_cb_t cb, void *ctx,
                      uint32_t buf_num, uint32_t buf_len)
{
    unsigned char *buf;
    FILE *fp = NULL;
    const char *path = getenv("MOCK_RTLSDR_FILE");
    struct timespec ts;
    double per_buf_s;

    (void)dev; (void)buf_num;
    if (!g_open || !g_reset) return -1;
    if (buf_len == 0) buf_len = 2 * 16384;
    buf = malloc(buf_len);
    if (!buf) return -1;
    if (path && *path) fp = fopen(path, "rb");

    per_buf_s = (double)buf_len / 2.0 / (double)g_rate;
    ts.tv_sec = (time_t)per_buf_s;
    ts.tv_nsec = (long)((per_buf_s - (double)ts.tv_sec) * 1e9);

    while (!g_cancel) {
        uint32_t i, got = 0;
        if (fp) {
            got = (uint32_t)fread(buf, 1, buf_len, fp);
            if (got < buf_len) {
                if (got == 0 && feof(fp)) { rewind(fp); continue; }
            }
        } else {
            for (i = 0; i < buf_len; i++) {
                g_lcg = (1103515245u * g_lcg + 12345u) & 0x7fffffffu;
                buf[i] = (unsigned char)((g_lcg >> 16) & 0xffu);
            }
            got = buf_len;
        }
        cb(buf, got, ctx);
        nanosleep(&ts, NULL);
    }
    if (fp) fclose(fp);
    free(buf);
    return 0;
}
