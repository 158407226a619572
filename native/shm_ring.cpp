// Native single-producer/single-consumer ring-buffer primitives.
//
// C++ replacement for the reference's pure-python atomic-counter protocol
// (src/planning/real_world/shared_memory/shared_memory_util.py:14-40 and
// shared_memory_ring_buffer.py:12-230): sequentially-consistent atomic
// counters plus bulk slot copy, operating directly on a shared-memory
// mapping owned by Python (multiprocessing.shared_memory). Exposed via a
// plain C ABI for ctypes — no pybind11 needed.
//
// Layout contract (matches python-side RingBuffer):
//   header: int64 write_count | int64 read_count
//   data:   capacity * slot_size bytes
//
// The producer writes the slot THEN publishes by incrementing write_count
// (release); consumers read write_count (acquire) before touching data —
// the same single-writer protocol the reference documents.

#include <atomic>
#include <cstdint>
#include <cstring>

extern "C" {

// counters -------------------------------------------------------------

int64_t shm_counter_load(const void* addr) {
    return reinterpret_cast<const std::atomic<int64_t>*>(addr)
        ->load(std::memory_order_acquire);
}

void shm_counter_store(void* addr, int64_t value) {
    reinterpret_cast<std::atomic<int64_t>*>(addr)
        ->store(value, std::memory_order_release);
}

int64_t shm_counter_add(void* addr, int64_t inc) {
    return reinterpret_cast<std::atomic<int64_t>*>(addr)
               ->fetch_add(inc, std::memory_order_acq_rel) + inc;
}

// ring buffer ----------------------------------------------------------

struct RingHeader {
    std::atomic<int64_t> write_count;
    std::atomic<int64_t> read_count;
};

// Producer: copy `slot_size` bytes into the next slot and publish.
// Returns the new write count.
int64_t shm_ring_put(void* base, int64_t capacity, int64_t slot_size,
                     const void* src) {
    auto* hdr = reinterpret_cast<RingHeader*>(base);
    char* data = reinterpret_cast<char*>(base) + sizeof(RingHeader);
    int64_t w = hdr->write_count.load(std::memory_order_relaxed);
    std::memcpy(data + (w % capacity) * slot_size, src,
                static_cast<size_t>(slot_size));
    hdr->write_count.store(w + 1, std::memory_order_release);
    return w + 1;
}

// Consumer: copy the most recent published slot out. Returns its sequence
// number, or -1 if nothing has been published yet.
int64_t shm_ring_get_latest(void* base, int64_t capacity, int64_t slot_size,
                            void* dst) {
    auto* hdr = reinterpret_cast<RingHeader*>(base);
    const char* data = reinterpret_cast<const char*>(base) + sizeof(RingHeader);
    int64_t w = hdr->write_count.load(std::memory_order_acquire);
    if (w <= 0) return -1;
    int64_t idx = (w - 1) % capacity;
    std::memcpy(dst, data + idx * slot_size, static_cast<size_t>(slot_size));
    return w - 1;
}

// Consumer: copy the k most recent slots (oldest first). Returns how many
// were copied (<= k).
int64_t shm_ring_get_last_k(void* base, int64_t capacity, int64_t slot_size,
                            int64_t k, void* dst) {
    auto* hdr = reinterpret_cast<RingHeader*>(base);
    const char* data = reinterpret_cast<const char*>(base) + sizeof(RingHeader);
    int64_t w = hdr->write_count.load(std::memory_order_acquire);
    int64_t n = w < k ? w : k;
    if (n > capacity) n = capacity;  // cannot read more than the ring holds
    char* out = reinterpret_cast<char*>(dst);
    for (int64_t i = 0; i < n; ++i) {
        int64_t seq = w - n + i;
        std::memcpy(out + i * slot_size, data + (seq % capacity) * slot_size,
                    static_cast<size_t>(slot_size));
    }
    return n;
}

int64_t shm_ring_count(const void* base) {
    return reinterpret_cast<const RingHeader*>(base)
        ->write_count.load(std::memory_order_acquire);
}

}  // extern "C"
