// Runtime-bound libusb-1.0 surface shared by the vendor capture drivers.
//
// This is the hw::usb wrapper slot (reference Usb.cpp:22-616): device
// enumeration, open/claim, vendor control transfers and bulk streaming.
// The library binds with dlopen at first use so the framework builds and
// runs on hosts without libusb (the CI case); NFCLAB_LIBUSB can point at
// an alternative library path, which the test-suite uses to substitute a
// mock device stack and exercise the full USB driver paths without
// hardware.
//
// Both transfer models are exposed: the reference's asynchronous
// multi-transfer engine (Usb.cpp:22-616 transferHandler — a pool of queued
// bulk transfers serviced by a libusb event loop, resubmitted from the
// completion callback) is the streaming default when the bound library
// exports the async surface; a synchronous libusb_bulk_transfer reader
// remains as the fallback (and is selectable with NFCLAB_USB_SYNC=1).

#pragma once

#include <cstdint>
#include <cstdlib>

#include <dlfcn.h>

#include <sys/time.h>
#include <sys/types.h>

// Public, ABI-stable layout of struct libusb_transfer (libusb.h; the fill
// helpers are header-inlines, so the struct itself is the wire contract).
struct NfclabUsbTransfer {
    void *dev_handle;
    uint8_t flags;
    unsigned char endpoint;
    unsigned char type;
    unsigned int timeout;
    int status;  // enum libusb_transfer_status
    int length;
    int actual_length;
    void (*callback)(NfclabUsbTransfer *);
    void *user_data;
    unsigned char *buffer;
    int num_iso_packets;
};

enum {
    NFCLAB_USB_TRANSFER_COMPLETED = 0,
    NFCLAB_USB_TRANSFER_ERROR = 1,
    NFCLAB_USB_TRANSFER_TIMED_OUT = 2,
    NFCLAB_USB_TRANSFER_CANCELLED = 3,
    NFCLAB_USB_TRANSFER_STALL = 4,
    NFCLAB_USB_TRANSFER_NO_DEVICE = 5,
    NFCLAB_USB_TRANSFER_TYPE_BULK = 2,
};

struct NfclabUsbApi {
    void *handle = nullptr;
    void *ctx = nullptr;  // process-wide libusb context (lazily initialized)

    int (*init)(void **) = nullptr;
    void (*exit_)(void *) = nullptr;
    ssize_t (*get_device_list)(void *, void ***) = nullptr;
    void (*free_device_list)(void **, int) = nullptr;
    int (*get_device_descriptor)(void *, void *) = nullptr;
    uint8_t (*get_bus_number)(void *) = nullptr;
    uint8_t (*get_device_address)(void *) = nullptr;
    int (*get_device_speed)(void *) = nullptr;
    int (*open_)(void *, void **) = nullptr;
    void (*close_)(void *) = nullptr;
    int (*claim_interface)(void *, int) = nullptr;
    int (*release_interface)(void *, int) = nullptr;
    int (*set_configuration)(void *, int) = nullptr;
    int (*control_transfer)(void *, uint8_t, uint8_t, uint16_t, uint16_t,
                            unsigned char *, uint16_t, unsigned int) = nullptr;
    int (*bulk_transfer)(void *, unsigned char, unsigned char *, int, int *,
                         unsigned int) = nullptr;

    // async surface (optional — null when the bound library lacks it;
    // drivers then use the synchronous reader)
    NfclabUsbTransfer *(*alloc_transfer)(int) = nullptr;
    void (*free_transfer)(NfclabUsbTransfer *) = nullptr;
    int (*submit_transfer)(NfclabUsbTransfer *) = nullptr;
    int (*cancel_transfer)(NfclabUsbTransfer *) = nullptr;
    int (*handle_events_timeout_completed)(void *, struct timeval *,
                                           int *) = nullptr;

    bool async_ok() const
    {
        return alloc_transfer && free_transfer && submit_transfer &&
               cancel_transfer && handle_events_timeout_completed &&
               !getenv("NFCLAB_USB_SYNC");
    }
};

// libusb constants used by the drivers (stable ABI values)
enum {
    NFCLAB_USB_DIR_OUT = 0x00,
    NFCLAB_USB_DIR_IN = 0x80,
    NFCLAB_USB_TYPE_VENDOR = 0x40,
    NFCLAB_USB_ERROR_TIMEOUT = -7,
    NFCLAB_USB_ERROR_NO_DEVICE = -4,
    NFCLAB_USB_SPEED_HIGH = 3,
    NFCLAB_USB_SPEED_SUPER = 4,
};

inline NfclabUsbApi &nfclab_usb_api()
{
    static NfclabUsbApi api = [] {
        NfclabUsbApi a;
        void *h = nullptr;
        if (const char *override = getenv("NFCLAB_LIBUSB"))
            h = dlopen(override, RTLD_NOW | RTLD_LOCAL);
        if (!h) {
            static const char *names[] = {"libusb-1.0.so.0", "libusb-1.0.so",
                                          nullptr};
            for (const char *const *n = names; *n && !h; n++)
                h = dlopen(*n, RTLD_NOW | RTLD_LOCAL);
        }
        if (!h)
            return a;
        auto bind = [h](const char *name, auto &fn) {
            fn = reinterpret_cast<std::decay_t<decltype(fn)>>(dlsym(h, name));
            return fn != nullptr;
        };
        bool ok = bind("libusb_init", a.init)
            && bind("libusb_exit", a.exit_)
            && bind("libusb_get_device_list", a.get_device_list)
            && bind("libusb_free_device_list", a.free_device_list)
            && bind("libusb_get_device_descriptor", a.get_device_descriptor)
            && bind("libusb_get_bus_number", a.get_bus_number)
            && bind("libusb_get_device_address", a.get_device_address)
            && bind("libusb_get_device_speed", a.get_device_speed)
            && bind("libusb_open", a.open_)
            && bind("libusb_close", a.close_)
            && bind("libusb_claim_interface", a.claim_interface)
            && bind("libusb_release_interface", a.release_interface)
            && bind("libusb_set_configuration", a.set_configuration)
            && bind("libusb_control_transfer", a.control_transfer)
            && bind("libusb_bulk_transfer", a.bulk_transfer);
        if (!ok)
            return a;
        // async surface is optional: bind what's there (all or nothing)
        bool async = bind("libusb_alloc_transfer", a.alloc_transfer)
            && bind("libusb_free_transfer", a.free_transfer)
            && bind("libusb_submit_transfer", a.submit_transfer)
            && bind("libusb_cancel_transfer", a.cancel_transfer)
            && bind("libusb_handle_events_timeout_completed",
                    a.handle_events_timeout_completed);
        if (!async) {
            a.alloc_transfer = nullptr;
            a.free_transfer = nullptr;
            a.submit_transfer = nullptr;
            a.cancel_transfer = nullptr;
            a.handle_events_timeout_completed = nullptr;
        }
        if (a.init(&a.ctx) != 0)
            return a;
        a.handle = h;
        return a;
    }();
    return api;
}
