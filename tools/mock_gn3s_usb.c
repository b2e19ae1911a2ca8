/* Mock libusb-1.0: the subset the GN3S binding uses
 * (gnsslib_tpu/io/gn3s.py), emulating a SiGe FX2 dongle so the binding
 * is testable without USB hardware.  Build:
 *
 *   gcc -shared -fPIC -O2 -o libmock_gn3s_usb.so tools/mock_gn3s_usb.c
 *
 * Behavior:
 *  - a single device VID 0x1781 with PID from MOCK_GN3S_PID (default
 *    0x0b3a, a v3 dongle; set 0x0b39 for v2);
 *  - control transfers record the (reqtype, request, value, index)
 *    vendor-request sequence, exposed through mock_usb_seq_len /
 *    mock_usb_seq (the FX2 programming order of gn3s.cpp:55-70);
 *    GET_STATUS(GS_RX_OVERRUN) returns 0 until MOCK_GN3S_OVERRUN_AFTER
 *    bulk reads have been served, then 1;
 *  - bulk IN on endpoint 0x86 fills the buffer from the u8 LCG
 *    x_{n+1} = (1103515245 x_n + 12345) mod 2^31, byte = (x>>16) & 0xff,
 *    seeded to 1 at libusb_open; for a v2 dongle bit 1 of every byte is
 *    forced per MOCK_GN3S_V2_SHIFT (0: first byte has bit1 set = no
 *    shift; 1: first byte has bit1 clear = one-byte shift), matching the
 *    packet-shift semantics of gn3s.cpp:95-109; reads are paced at
 *    16.368 MB/s.
 */
#include <stdint.h>
#include <stdlib.h>
#include <time.h>

static int g_marker = 0x474e3353;            /* "GN3S" handle */
static int g_ctx = 0;
static uint32_t g_lcg = 1;
static long g_bulk_reads = 0;
static int g_claimed = -1, g_alt = -1;

#define SEQ_MAX 64
static struct { uint8_t t, r; uint16_t v, i; } g_seq[SEQ_MAX];
static int g_seq_len = 0;

int mock_usb_seq_len(void) { return g_seq_len; }
uint64_t mock_usb_seq(int i)
{
    if (i < 0 || i >= g_seq_len) return 0;
    return ((uint64_t)g_seq[i].t << 48) | ((uint64_t)g_seq[i].r << 32) |
           ((uint64_t)g_seq[i].v << 16) | (uint64_t)g_seq[i].i;
}
int mock_usb_get_claimed(void) { return g_claimed; }
long mock_usb_get_bulk_reads(void) { return g_bulk_reads; }

int libusb_init(void **ctx)
{
    if (ctx) *ctx = &g_ctx;
    return 0;
}

void libusb_exit(void *ctx) { (void)ctx; }

static int mock_pid(void)
{
    const char *p = getenv("MOCK_GN3S_PID");
    return p && *p ? (int)strtol(p, NULL, 0) : 0x0b3a;
}

void *libusb_open_device_with_vid_pid(void *ctx, uint16_t vid,
                                      uint16_t pid)
{
    (void)ctx;
    if (vid != 0x1781 || pid != mock_pid()) return NULL;
    g_lcg = 1;
    g_bulk_reads = 0;
    g_seq_len = 0;
    return &g_marker;
}

void libusb_close(void *h) { (void)h; }

int libusb_claim_interface(void *h, int iface)
{
    (void)h; g_claimed = iface; return 0;
}

int libusb_release_interface(void *h, int iface)
{
    (void)h; (void)iface; g_claimed = -1; return 0;
}

int libusb_set_interface_alt_setting(void *h, int iface, int alt)
{
    (void)h; (void)iface; g_alt = alt; return 0;
}

int libusb_control_transfer(void *h, uint8_t reqtype, uint8_t request,
                            uint16_t value, uint16_t index,
                            unsigned char *data, uint16_t length,
                            unsigned int timeout)
{
    (void)h; (void)timeout;
    if (g_seq_len < SEQ_MAX) {
        g_seq[g_seq_len].t = reqtype;
        g_seq[g_seq_len].r = request;
        g_seq[g_seq_len].v = value;
        g_seq[g_seq_len].i = index;
        g_seq_len++;
    }
    if (reqtype == 0xC0 && request == 0x80) {   /* GET_STATUS */
        const char *ov = getenv("MOCK_GN3S_OVERRUN_AFTER");
        if (length < 1 || !data) return -1;
        data[0] = (index == 1 && ov && *ov &&
                   g_bulk_reads >= atol(ov)) ? 1 : 0;
        return 1;
    }
    if (reqtype == 0xC0) {                      /* other vendor-IN */
        uint16_t k;
        for (k = 0; k < length; k++) data[k] = 0;
        return length;
    }
    return length;                              /* vendor-OUT ack */
}

int libusb_bulk_transfer(void *h, unsigned char ep, unsigned char *data,
                         int length, int *transferred,
                         unsigned int timeout)
{
    int i;
    struct timespec ts;
    const char *shift = getenv("MOCK_GN3S_V2_SHIFT");
    int v2 = mock_pid() == 0x0b39;

    (void)h; (void)timeout;
    if (ep != 0x86) return -1;
    for (i = 0; i < length; i++) {
        g_lcg = (1103515245u * g_lcg + 12345u) & 0x7fffffffu;
        data[i] = (unsigned char)((g_lcg >> 16) & 0xffu);
        if (v2) {
            /* bit 1 is the packet-shift marker: deterministic per the
             * requested scenario (gn3s.cpp:95-109) */
            if (shift && *shift == '1')
                data[i] = (unsigned char)(data[i] & ~0x02u);
            else
                data[i] = (unsigned char)(data[i] | 0x02u);
        }
    }
    if (transferred) *transferred = length;
    g_bulk_reads++;
    /* pace at 16.368 MB/s (1 byte/sample at the GN3S narrow rate) */
    ts.tv_sec = 0;
    ts.tv_nsec = (long)(length / 16.368e6 * 1e9);
    nanosleep(&ts, NULL);
    return 0;
}
