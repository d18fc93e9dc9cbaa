// COMPILE-CHECK STUB of the Spinnaker SDK surface used by
// src/flir_capture.cpp — see test_stubs/zed/sl/Camera.hpp for the rationale.
// Inert inline no-ops; never functional, never shipped.
#pragma once

#include <cstddef>
#include <cstdint>
#include <memory>
#include <string>

namespace Spinnaker {

enum PixelFormatEnums { PixelFormat_BGR8 };
enum ColorProcessingAlgorithm { HQ_LINEAR };

namespace GenApi {

class INode;

class CIntegerPtr {
  public:
    explicit CIntegerPtr(INode*) {}
    CIntegerPtr* operator->() { return this; }
    void SetValue(std::int64_t) {}
};

class CBooleanPtr {
  public:
    explicit CBooleanPtr(INode*) {}
    CBooleanPtr* operator->() { return this; }
    void SetValue(bool) {}
};

class CFloatPtr {
  public:
    explicit CFloatPtr(INode*) {}
    CFloatPtr* operator->() { return this; }
    void SetValue(double) {}
};

class CEnumerationPtr {
  public:
    explicit CEnumerationPtr(INode*) {}
    CEnumerationPtr* operator->() { return this; }
    void SetIntValue(std::int64_t) {}
};

class INodeMap {
  public:
    INode* GetNode(const char*) { return nullptr; }
};

}  // namespace GenApi

class ImagePtr;

class Image {
  public:
    bool IsIncomplete() const { return true; }
    void Release() {}
    std::size_t GetWidth() const { return 0; }
    std::size_t GetHeight() const { return 0; }
    void* GetData() const { return nullptr; }
    ImagePtr Convert(PixelFormatEnums, ColorProcessingAlgorithm) const;
};

class ImagePtr {
  public:
    Image* operator->() const { return const_cast<Image*>(&img_); }

  private:
    Image img_;
};

inline ImagePtr Image::Convert(PixelFormatEnums, ColorProcessingAlgorithm) const {
    return ImagePtr();
}

class Camera {
  public:
    void Init() {}
    void DeInit() {}
    GenApi::INodeMap& GetNodeMap() { return nodemap_; }
    void BeginAcquisition() {}
    void EndAcquisition() {}
    ImagePtr GetNextImage(int) { return ImagePtr(); }

  private:
    GenApi::INodeMap nodemap_;
};

class CameraPtr {
  public:
    bool IsValid() const { return false; }
    Camera* operator->() const { return const_cast<Camera*>(&cam_); }

  private:
    Camera cam_;
};

class CameraList {
  public:
    CameraPtr GetBySerial(const std::string&) { return CameraPtr(); }
    void Clear() {}
};

class System;

class SystemPtr {
  public:
    System* operator->() const;
};

class System {
  public:
    static SystemPtr GetInstance() { return SystemPtr(); }
    CameraList GetCameras() { return CameraList(); }
    void ReleaseInstance() {}
};

inline System* SystemPtr::operator->() const {
    static System system;
    return &system;
}

}  // namespace Spinnaker
