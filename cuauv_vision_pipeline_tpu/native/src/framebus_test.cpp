// Native self-test for the frame bus (no Python, no test framework).
//
// Exercises the C++ layer directly: create/open lifecycle, single- and
// multi-plane round-trips, latest-wins, NO_NEW_FRAME, deleted-flag
// propagation, blocking reads, and the seqlock torn-read property under a
// hammering writer thread. Run via `make test`.

#include "framebus.hpp"
#include "capture_harness.hpp"

#include <atomic>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

#define CHECK(cond)                                                          \
    do {                                                                     \
        if (!(cond)) {                                                       \
            std::fprintf(stderr, "FAIL %s:%d: %s\n", __FILE__, __LINE__,     \
                         #cond);                                             \
            return 1;                                                        \
        }                                                                    \
    } while (0)

static int test_roundtrip() {
    framebus::Bus bus("nativetest_rt", 1 << 16);
    std::vector<unsigned char> img(64 * 64 * 3, 42);
    framebus::PlaneWrite plane{64, 64, 3, 1, img.data(), "rgb"};
    CHECK(bus.write(123, &plane, 1) == framebus::SUCCESS);

    framebus::Bus reader("nativetest_rt");
    framebus::Frame frame;
    CHECK(reader.read(frame, false) == framebus::SUCCESS);
    CHECK(frame.acquisition_time == 123);
    CHECK(frame.plane_count == 1);
    CHECK(std::strcmp(frame.planes[0].name, "rgb") == 0);
    CHECK(frame.total_size == img.size());
    CHECK(std::memcmp(frame.data, img.data(), img.size()) == 0);
    // consumed: next read reports no new frame
    CHECK(reader.read(frame, false) == framebus::NO_NEW_FRAME);
    return 0;
}

static int test_latest_wins_multiplane() {
    framebus::Bus bus("nativetest_lw", 1 << 16);
    std::vector<unsigned char> a(1024, 1);
    std::vector<float> b(256, 2.5f);
    for (int i = 0; i < 10; ++i) {
        a.assign(a.size(), static_cast<unsigned char>(i));
        framebus::PlaneWrite planes[2] = {
            {32, 32, 1, 1, a.data(), "u8"},
            {16, 16, 1, 4, b.data(), "f32"},
        };
        CHECK(bus.write(i, planes, 2) == framebus::SUCCESS);
    }
    framebus::Frame frame;
    CHECK(bus.read(frame, false) == framebus::SUCCESS);
    CHECK(frame.acquisition_time == 9);
    CHECK(frame.plane_count == 2);
    const unsigned char* data =
        static_cast<const unsigned char*>(frame.data) + frame.planes[0].offset;
    CHECK(data[0] == 9);
    const float* fdata = reinterpret_cast<const float*>(
        static_cast<const unsigned char*>(frame.data) + frame.planes[1].offset);
    CHECK(fdata[0] == 2.5f);
    return 0;
}

static int test_deleted_propagates() {
    auto* creator = new framebus::Bus("nativetest_del", 4096);
    std::vector<unsigned char> img(64, 7);
    framebus::PlaneWrite plane{8, 8, 1, 1, img.data(), nullptr};
    creator->write(1, &plane, 1);

    framebus::Bus reader("nativetest_del");
    framebus::Frame frame;
    CHECK(reader.read(frame, false) == framebus::SUCCESS);
    delete creator;  // creator teardown
    CHECK(reader.read(frame, false) == framebus::FRAMEWORK_DELETED);
    return 0;
}

static int test_blocking_read() {
    framebus::Bus bus("nativetest_blk", 4096);
    framebus::Bus reader("nativetest_blk");
    framebus::Frame frame;

    // timeout path
    auto t0 = std::chrono::steady_clock::now();
    CHECK(reader.read(frame, true, 200) == framebus::NO_NEW_FRAME);
    auto waited = std::chrono::steady_clock::now() - t0;
    CHECK(waited >= std::chrono::milliseconds(150));

    // wake path
    std::thread writer([&bus] {
        std::this_thread::sleep_for(std::chrono::milliseconds(100));
        std::vector<unsigned char> img(64, 9);
        framebus::PlaneWrite plane{8, 8, 1, 1, img.data(), nullptr};
        bus.write(77, &plane, 1);
    });
    t0 = std::chrono::steady_clock::now();
    CHECK(reader.read(frame, true, 2000) == framebus::SUCCESS);
    waited = std::chrono::steady_clock::now() - t0;
    CHECK(frame.acquisition_time == 77);
    CHECK(waited < std::chrono::milliseconds(1000));
    writer.join();
    return 0;
}

static int test_seqlock_under_hammer() {
    constexpr std::size_t kPixels = 64 * 64 * 3;
    framebus::Bus bus("nativetest_hammer", kPixels);
    std::atomic<bool> stop{false};

    std::thread writer([&] {
        std::vector<unsigned char> img(kPixels);
        std::uint64_t i = 0;
        while (!stop.load(std::memory_order_relaxed)) {
            ++i;
            img.assign(img.size(), static_cast<unsigned char>(i % 251));
            framebus::PlaneWrite plane{64, 64, 3, 1, img.data(), nullptr};
            bus.write(i, &plane, 1);
        }
    });

    framebus::Bus reader("nativetest_hammer");
    framebus::Frame frame;
    int seen = 0;
    std::uint64_t last_t = 0;
    // Run until enough samples accumulate; the hard cap only guards a hung
    // bus. On a loaded single-core host the reader can starve for long
    // stretches, so wall time is not the pass criterion — tear-freedom is.
    auto deadline = std::chrono::steady_clock::now() + std::chrono::seconds(30);
    while (seen < 200 && std::chrono::steady_clock::now() < deadline) {
        if (reader.read(frame, false) == framebus::SUCCESS) {
            const unsigned char* data =
                static_cast<const unsigned char*>(frame.data);
            const unsigned char expected =
                static_cast<unsigned char>(frame.acquisition_time % 251);
            for (std::size_t p = 0; p < frame.total_size; ++p) {
                if (data[p] != expected) {
                    std::fprintf(stderr, "FAIL: torn frame at byte %zu\n", p);
                    stop = true;
                    writer.join();
                    return 1;
                }
            }
            CHECK(frame.acquisition_time > last_t);
            last_t = frame.acquisition_time;
            ++seen;
        }
    }
    stop = true;
    writer.join();
    CHECK(seen > 100);
    std::printf("  seqlock hammer: %d consistent reads\n", seen);
    return 0;
}

static int test_capture_harness() {
    capture::CaptureSource cs;
    std::atomic<int> frames_written{0};
    cs.register_udl("gen", [&](capture::CaptureSource& c, capture::QuitFlag& q) {
        capture::FpsLimiter limiter(500);
        std::vector<unsigned char> img(16 * 16 * 3, 5);
        while (!q.is_set() && frames_written < 20) {
            std::uint64_t t = limiter.tick();
            c.write_image<unsigned char>("nativetest_cap", t, 16, 16, 3,
                                         img.data());
            ++frames_written;
        }
        q.set();
    });
    cs.run_until_complete();
    CHECK(frames_written == 20);
    framebus::Bus reader("nativetest_cap");
    framebus::Frame frame;
    // NOTE: the harness's blocks die with the CaptureSource; read before it
    // is destroyed is covered by the python tests — here just check counts.
    return 0;
}

int main() {
    struct {
        const char* name;
        int (*fn)();
    } tests[] = {
        {"roundtrip", test_roundtrip},
        {"latest_wins_multiplane", test_latest_wins_multiplane},
        {"deleted_propagates", test_deleted_propagates},
        {"blocking_read", test_blocking_read},
        {"seqlock_under_hammer", test_seqlock_under_hammer},
        {"capture_harness", test_capture_harness},
    };
    int failures = 0;
    for (const auto& t : tests) {
        std::printf("[ RUN ] %s\n", t.name);
        if (t.fn() != 0) {
            ++failures;
            std::printf("[FAIL ] %s\n", t.name);
        } else {
            std::printf("[ OK  ] %s\n", t.name);
        }
    }
    if (failures) {
        std::printf("%d test(s) FAILED\n", failures);
        return 1;
    }
    std::printf("all native tests passed\n");
    return 0;
}
