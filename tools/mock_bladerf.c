/* Mock libbladeRF: the API surface the reference driver uses
 * (src/rcv/bladerf/bladerf.c), emitting a deterministic SC16 stream so
 * gnsslib_tpu/io/bladerf.py's ctypes binding is testable without USB
 * hardware.  Build:
 *
 *   gcc -shared -fPIC -O2 -o libmock_bladerf.so tools/mock_bladerf.c
 *
 * Behavior:
 *  - sample generator: int16 LCG x_{n+1} = (1103515245 x_n + 12345)
 *    mod 2^31, sample n = (x_n >> 8) & 0xffff (full 16 bits, so the
 *    binding's 12-bit mask + DC removal is actually exercised), seeded
 *    to 1 at bladerf_stream start;
 *  - bladerf_stream paces buffers at the configured sample rate and
 *    calls the callback with each buffer; a NULL callback return stops
 *    the stream (the binding's close contract);
 *  - MOCK_BLADERF_UNCONFIGURED=1 makes is_fpga_configured return 0 so
 *    the FPGA-load branch is testable;
 *  - every configuration setter records its value, exposed through
 *    mock_bladerf_get_* getters.
 */
#include <stdint.h>
#include <stdlib.h>
#include <string.h>
#include <time.h>

typedef void *(*bladerf_stream_cb)(void *dev, void *stream, void *meta,
                                   void *samples, size_t num_samples,
                                   void *user_data);

#define NBUF_MAX 64

static uint32_t g_freq, g_bw, g_rate = 4000000;
static int g_enabled = 0, g_fpga_loaded = 0;
static int g_marker = 0x42524631;            /* "BRF1" device handle */
static int g_smarker = 0x53545231;           /* stream handle */

static struct {
    bladerf_stream_cb cb;
    void *bufs[NBUF_MAX];
    size_t nbuf, samples_per_buf;
    void *user;
} g_stream;

uint32_t mock_bladerf_get_freq(void) { return g_freq; }
uint32_t mock_bladerf_get_bw(void) { return g_bw; }
uint32_t mock_bladerf_get_rate(void) { return g_rate; }
int mock_bladerf_get_enabled(void) { return g_enabled; }
int mock_bladerf_get_fpga_loaded(void) { return g_fpga_loaded; }

const char *bladerf_strerror(int err) { (void)err; return "mock error"; }

int bladerf_open(void **dev, const char *devid)
{
    (void)devid;
    *dev = &g_marker;
    return 0;
}

void bladerf_close(void *dev) { (void)dev; }

int bladerf_is_fpga_configured(void *dev)
{
    const char *u = getenv("MOCK_BLADERF_UNCONFIGURED");
    (void)dev;
    if (u && *u == '1' && !g_fpga_loaded) return 0;
    return 1;
}

int bladerf_get_fpga_size(void *dev, int *size)
{
    (void)dev; *size = 115; return 0;
}

int bladerf_load_fpga(void *dev, const char *file)
{
    (void)dev;
    if (!file || !*file) return -1;
    g_fpga_loaded = 1;
    return 0;
}

int bladerf_set_frequency(void *dev, int module, uint32_t freq)
{
    (void)dev; (void)module; g_freq = freq; return 0;
}

int bladerf_set_bandwidth(void *dev, int module, uint32_t bw,
                          uint32_t *actual)
{
    (void)dev; (void)module;
    g_bw = bw;
    if (actual) *actual = bw;
    return 0;
}

int bladerf_set_sample_rate(void *dev, int module, uint32_t rate,
                            uint32_t *actual)
{
    (void)dev; (void)module;
    if (rate < 160000 || rate > 40000000) return -22;
    g_rate = rate;
    if (actual) *actual = rate;
    return 0;
}

int bladerf_init_stream(void **stream, void *dev, bladerf_stream_cb cb,
                        void ***buffers, size_t num_buffers, int format,
                        size_t samples_per_buffer, size_t num_transfers,
                        void *user_data)
{
    size_t i;
    (void)dev; (void)num_transfers;
    if (format != 0 || num_buffers > NBUF_MAX) return -22;
    g_stream.cb = cb;
    g_stream.nbuf = num_buffers;
    g_stream.samples_per_buf = samples_per_buffer;
    g_stream.user = user_data;
    for (i = 0; i < num_buffers; i++)
        g_stream.bufs[i] = malloc(samples_per_buffer * 4);
    *buffers = g_stream.bufs;
    *stream = &g_smarker;
    return 0;
}

int bladerf_enable_module(void *dev, int module, int enable)
{
    (void)dev; (void)module;
    g_enabled = enable;
    return 0;
}

int bladerf_stream(void *stream, int module)
{
    uint32_t lcg = 1;
    uint64_t count = 0;
    struct timespec ts;
    double per_buf_s;
    int16_t *buf;
    size_t i;
    void *next;

    (void)module;
    if (stream != (void *)&g_smarker || !g_enabled) return -1;
    per_buf_s = (double)g_stream.samples_per_buf / (double)g_rate;
    ts.tv_sec = (time_t)per_buf_s;
    ts.tv_nsec = (long)((per_buf_s - (double)ts.tv_sec) * 1e9);

    buf = (int16_t *)g_stream.bufs[0];
    for (;;) {
        for (i = 0; i < 2 * g_stream.samples_per_buf; i++) {
            lcg = (1103515245u * lcg + 12345u) & 0x7fffffffu;
            buf[i] = (int16_t)((lcg >> 8) & 0xffffu);
        }
        next = g_stream.cb(&g_marker, stream, NULL, buf,
                           g_stream.samples_per_buf, g_stream.user);
        if (!next) break;
        buf = (int16_t *)next;
        count++;
        nanosleep(&ts, NULL);
    }
    return 0;
}

void bladerf_deinit_stream(void *stream)
{
    size_t i;
    (void)stream;
    for (i = 0; i < g_stream.nbuf; i++) {
        free(g_stream.bufs[i]);
        g_stream.bufs[i] = NULL;
    }
}
