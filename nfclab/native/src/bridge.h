// Shared driver-table surface of the native capture bridge.
//
// Mirrors hw::radio::RadioDevice / hw::logic::LogicDevice (RadioDevice.h:
// 33-78, LogicDevice.h:37-75): enumerate / open / set-param /
// start(callback) / stop, parameter ids as in nfclab.hw.device.  Drivers
// from any translation unit register here (network clients in
// sdr_bridge.cpp, dlopen'd vendor USB drivers in usb_drivers.cpp).

#pragma once

#include <cstdint>

extern "C" {

typedef void (*nfclab_stream_cb)(const float *samples, int64_t count,
                                 int64_t offset, void *user);

struct NfclabSdrDriver {
    const char *type_name;
    int (*enumerate)(char *out, int out_len);
    void *(*open_dev)(const char *ident);
    int (*set_param)(void *dev, int param, double value);
    double (*get_param)(void *dev, int param);
    int (*start)(void *dev, nfclab_stream_cb cb, void *user);
    int (*stop)(void *dev);
    void (*close_dev)(void *dev);
};

}  // extern "C"

// registration hook for additional translation units (called once from the
// registry init in sdr_bridge.cpp)
#include <vector>
void nfclab_register_usb_drivers(std::vector<NfclabSdrDriver> &out);
void nfclab_register_usb_logic_drivers(std::vector<NfclabSdrDriver> &out);
