// Mock libusb-1.0 for exercising the USB logic-analyzer drivers without
// hardware.  Compiled by tests/test_usb_logic.py and injected via
// NFCLAB_LIBUSB (usb_api.h's loader override).
//
// Emulates one Sipeed SLogic Combo8 (359f:0300) and one DSLogic Plus
// (2a0e:0030) on the bus.  Control transfers implement just enough of each
// device's vendor protocol for the drivers' bring-up/arm/start sequences to
// succeed (and are sanity-checked: bulk IN yields data only after the
// device-specific start command).  Bulk IN streams the contents of
// NFCLAB_MOCK_PAYLOAD_SIPEED / NFCLAB_MOCK_PAYLOAD_DSLOGIC in deliberately
// ragged chunk sizes (to exercise the drivers' partial-chunk carry), then
// reports LIBUSB_ERROR_NO_DEVICE so the driver signals EOF.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <deque>
#include <mutex>
#include <vector>

#include <unistd.h>

namespace {

enum { ERR_TIMEOUT = -7, ERR_NO_DEVICE = -4, ERR_IO = -1 };

struct MockDevice {
    uint16_t vid, pid;
    uint8_t bus, addr;
    const char *payload_env;
    // state
    bool started = false;
    bool payload_loaded = false;
    std::vector<uint8_t> payload;
    size_t pos = 0;
    uint64_t bulk_out_bytes = 0;
    uint8_t pending_dest = 0xff;   // dslogic CMD_CTL_RD_PRE header
    uint16_t pending_offset = 0;
    std::mutex mu;

    void load_payload()
    {
        if (payload_loaded)
            return;
        payload_loaded = true;
        const char *path = getenv(payload_env);
        if (!path)
            return;
        FILE *f = fopen(path, "rb");
        if (!f)
            return;
        fseek(f, 0, SEEK_END);
        const long n = ftell(f);
        fseek(f, 0, SEEK_SET);
        payload.resize(n);
        if (fread(payload.data(), 1, n, f) != (size_t)n)
            payload.clear();
        fclose(f);
    }
};

MockDevice g_sipeed {0x359F, 0x0300, 1, 4, "NFCLAB_MOCK_PAYLOAD_SIPEED"};
MockDevice g_dslogic {0x2A0E, 0x0030, 1, 5, "NFCLAB_MOCK_PAYLOAD_DSLOGIC"};
MockDevice *g_devices[] = {&g_sipeed, &g_dslogic};

}  // namespace

extern "C" {

int libusb_init(void **ctx)
{
    static int dummy;
    if (ctx)
        *ctx = &dummy;
    return 0;
}

void libusb_exit(void *) {}

ssize_t libusb_get_device_list(void *, void ***list)
{
    static void *devs[3] = {g_devices[0], g_devices[1], nullptr};
    *list = devs;
    return 2;
}

void libusb_free_device_list(void **, int) {}

int libusb_get_device_descriptor(void *dev, void *desc)
{
    auto *d = static_cast<MockDevice *>(dev);
    auto *raw = static_cast<uint8_t *>(desc);
    memset(raw, 0, 18);
    raw[0] = 18;    // bLength
    raw[1] = 1;     // bDescriptorType DEVICE
    raw[8] = d->vid & 0xff;
    raw[9] = d->vid >> 8;
    raw[10] = d->pid & 0xff;
    raw[11] = d->pid >> 8;
    return 0;
}

uint8_t libusb_get_bus_number(void *dev)
{
    return static_cast<MockDevice *>(dev)->bus;
}

uint8_t libusb_get_device_address(void *dev)
{
    return static_cast<MockDevice *>(dev)->addr;
}

int libusb_get_device_speed(void *)
{
    return 3;  // LIBUSB_SPEED_HIGH
}

int libusb_open(void *dev, void **handle)
{
    *handle = dev;
    return 0;
}

void libusb_close(void *) {}

int libusb_claim_interface(void *, int) { return 0; }
int libusb_release_interface(void *, int) { return 0; }
int libusb_set_configuration(void *, int) { return 0; }

int libusb_control_transfer(void *handle, uint8_t req_type, uint8_t request,
                            uint16_t, uint16_t, unsigned char *data,
                            uint16_t length, unsigned int)
{
    auto *d = static_cast<MockDevice *>(handle);
    std::lock_guard<std::mutex> lock(d->mu);
    if (d == &g_sipeed) {
        if (request == 0xb1) {         // CMD_START {rate MHz u16, ch u8, 0}
            if (length != 4 || !data || data[2] != 8)
                return ERR_IO;
            d->started = true;
            return length;
        }
        if (request == 0xb3) {         // CMD_STOP
            d->started = false;
            return length;
        }
        return ERR_IO;
    }
    // dslogic: header = {dest u8, offset u16, size u8}
    if (request == 0xb0 && length >= 4 && data) {  // CMD_CTL_WR
        const uint8_t dest = data[0];
        if (dest == 8)                 // DSL_CTL_START
            d->started = true;
        else if (dest == 9)            // DSL_CTL_STOP
            d->started = false;
        return length;
    }
    if (request == 0xb1 && length >= 4 && data) {  // CMD_CTL_RD_PRE
        d->pending_dest = data[0];
        memcpy(&d->pending_offset, data + 1, 2);
        return length;
    }
    if (request == 0xb2 && data) {     // CMD_CTL_RD
        memset(data, 0, length);
        switch (d->pending_dest) {
            case 0:                    // FW_VERSION -> 2.0
                if (length >= 1) data[0] = 2;
                break;
            case 2:                    // HW_STATUS: FPGA done, sys clear,
                data[0] = 0xC8;        // GPIF done (no bitstream upload)
                break;
            case 15:                   // I2C_STATUS (HDL version reg)
                data[0] = 0x0E;
                break;
        }
        return length;
    }
    return ERR_IO;
}

int libusb_bulk_transfer(void *handle, unsigned char endpoint,
                         unsigned char *data, int length, int *actual,
                         unsigned int)
{
    auto *d = static_cast<MockDevice *>(handle);
    std::lock_guard<std::mutex> lock(d->mu);
    *actual = 0;
    if (!(endpoint & 0x80)) {          // OUT: accept (FPGA settings/bitstream)
        d->bulk_out_bytes += length;
        *actual = length;
        return 0;
    }
    if (!d->started)
        return ERR_TIMEOUT;
    d->load_payload();
    if (d->pos >= d->payload.size())
        return ERR_NO_DEVICE;          // stream exhausted -> device gone
    // ragged chunks exercise the drivers' partial-chunk carry handling
    size_t n = 3333;
    if (n > (size_t)length)
        n = length;
    if (n > d->payload.size() - d->pos)
        n = d->payload.size() - d->pos;
    memcpy(data, d->payload.data() + d->pos, n);
    d->pos += n;
    *actual = (int)n;
    return 0;
}

// ------------------------------------------------------- async surface
//
// Mirrors the public struct libusb_transfer ABI (see usb_api.h
// NfclabUsbTransfer).  submit queues; handle_events_timeout_completed
// services queued transfers from the same payload stream as the sync
// path (same ragged chunks), invoking completion callbacks on the
// caller's thread exactly like libusb's event loop.

struct MockTransfer {
    void *dev_handle;
    uint8_t flags;
    unsigned char endpoint;
    unsigned char type;
    unsigned int timeout;
    int status;
    int length;
    int actual_length;
    void (*callback)(MockTransfer *);
    void *user_data;
    unsigned char *buffer;
    int num_iso_packets;
};

namespace {

enum {
    XFER_COMPLETED = 0, XFER_ERROR = 1, XFER_CANCELLED = 3,
    XFER_NO_DEVICE = 5,
};

std::mutex g_async_mu;
std::deque<MockTransfer *> g_pending;

}  // namespace

MockTransfer *libusb_alloc_transfer(int)
{
    return new MockTransfer {};
}

void libusb_free_transfer(MockTransfer *t)
{
    delete t;
}

int libusb_submit_transfer(MockTransfer *t)
{
    std::lock_guard<std::mutex> lock(g_async_mu);
    g_pending.push_back(t);
    return 0;
}

int libusb_cancel_transfer(MockTransfer *t)
{
    std::lock_guard<std::mutex> lock(g_async_mu);
    for (MockTransfer *p : g_pending)
        if (p == t) {
            t->status = XFER_CANCELLED;
            return 0;
        }
    return -5;  // LIBUSB_ERROR_NOT_FOUND (not currently submitted)
}

int libusb_handle_events_timeout_completed(void *, struct timeval *, int *)
{
    // service a bounded batch per call (the real event loop wakes per URB)
    for (int served = 0; served < 4; served++) {
        MockTransfer *t;
        {
            std::lock_guard<std::mutex> lock(g_async_mu);
            if (g_pending.empty()) {
                if (served == 0)  // idle: don't let callers busy-spin
                    usleep(2000);
                return 0;
            }
            t = g_pending.front();
            g_pending.pop_front();
        }
        if (t->status != XFER_CANCELLED) {
            auto *d = static_cast<MockDevice *>(t->dev_handle);
            std::lock_guard<std::mutex> lock(d->mu);
            t->actual_length = 0;
            if (!(t->endpoint & 0x80)) {
                d->bulk_out_bytes += t->length;
                t->actual_length = t->length;
                t->status = XFER_COMPLETED;
            } else if (!d->started) {
                // no data yet: keep it queued like a pending URB
                {
                    std::lock_guard<std::mutex> qlock(g_async_mu);
                    g_pending.push_back(t);
                }
                usleep(2000);
                return 0;
            } else {
                d->load_payload();
                if (d->pos >= d->payload.size()) {
                    t->status = XFER_NO_DEVICE;  // stream exhausted
                } else {
                    size_t n = 3333;
                    if (n > (size_t)t->length)
                        n = t->length;
                    if (n > d->payload.size() - d->pos)
                        n = d->payload.size() - d->pos;
                    memcpy(t->buffer, d->payload.data() + d->pos, n);
                    d->pos += n;
                    t->actual_length = (int)n;
                    t->status = XFER_COMPLETED;
                }
            }
        }
        if (t->callback)
            t->callback(t);
    }
    return 0;
}

}  // extern "C"
