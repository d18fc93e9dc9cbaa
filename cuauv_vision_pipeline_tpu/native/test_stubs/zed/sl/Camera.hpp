// COMPILE-CHECK STUB of the ZED SDK surface used by src/zed_capture.cpp.
// Mirrors the subset of <sl/Camera.hpp> (types, enums, method signatures)
// so `make stubcheck` can fully compile + link the vehicle-only binary on
// machines without the SDK (reference gates the same way,
// reference configure.py:42-86). Every method is an inert inline no-op —
// NEVER functional, never shipped.
#pragma once

#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <vector>

namespace sl {

using uchar1 = unsigned char;
using float1 = float;

enum class ERROR_CODE { SUCCESS = 0, FAILURE = 1 };
enum class VIEW { LEFT, RIGHT };
enum class MEASURE { DEPTH, NORMALS };
enum class RESOLUTION { HD720, HD1080 };
enum class DEPTH_MODE { NEURAL, ULTRA, PERFORMANCE };
enum class UNIT { METER, MILLIMETER };
enum class VIDEO_SETTINGS {
    BRIGHTNESS,
    CONTRAST,
    HUE,
    SATURATION,
    GAMMA,
    SHARPNESS,
    WHITEBALANCE_TEMPERATURE,
    WHITEBALANCE_AUTO,
    EXPOSURE,
    GAIN,
    AEC_AGC,
};

class Mat {
  public:
    std::size_t getWidth() const { return 0; }
    std::size_t getHeight() const { return 0; }
    template <typename T>
    T* getPtr() const {
        return nullptr;
    }
};

struct InitParameters {
    RESOLUTION camera_resolution = RESOLUTION::HD720;
    DEPTH_MODE depth_mode = DEPTH_MODE::NEURAL;
    UNIT coordinate_units = UNIT::METER;
    float depth_minimum_distance = 0.f;
    float depth_maximum_distance = 0.f;
};

class Camera {
  public:
    ERROR_CODE open(const InitParameters&) { return ERROR_CODE::FAILURE; }
    ERROR_CODE grab() { return ERROR_CODE::FAILURE; }
    ERROR_CODE retrieveImage(Mat&, VIEW) { return ERROR_CODE::FAILURE; }
    ERROR_CODE retrieveMeasure(Mat&, MEASURE) { return ERROR_CODE::FAILURE; }
    void setCameraSettings(VIDEO_SETTINGS, int) {}
    void close() {}
};

}  // namespace sl
