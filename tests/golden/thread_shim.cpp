// Shim TU standing in for the reference's libs/thread.cpp when building the
// reference *apps* for baseline measurement and golden end-to-end parity.
//
// Why: libs/thread.cpp:82 constructs `std::vector<IJThread>` from an
// initializer list, which requires copy-constructible elements; IJThread is
// move-only, so the TU fails to compile under gcc 12 (the reference was
// developed with Clang 10, reference README.md:105-110). The apps use only
// `ThreadGuard` from that TU (apps/encoder.cpp:225-226,
// apps/decoder.cpp:117); the interruptible-thread machinery is dead code
// w.r.t. the apps (SURVEY.md section 2 row 12).
//
// ThreadGuard here matches thread.cpp:3-9 behaviorally; the InterruptFlag
// member definitions exist only to satisfy the linker and are never invoked
// by the apps.
#include "thread.hpp"

ThreadGuard::ThreadGuard(std::thread& t) : t_{t} {}
ThreadGuard::~ThreadGuard() {
  if (t_.joinable()) t_.join();
}

InterruptFlag::InterruptFlag() : flag_{0}, thread_cond_{}, thread_cond_any_{} {}
void InterruptFlag::Set() {}
bool InterruptFlag::IsSet() const { return flag_.load(std::memory_order_relaxed); }
void InterruptFlag::SetCondVar(std::condition_variable&) {}
void InterruptFlag::ClearCondVar() {}
InterruptFlag::ClearCondVarOnDestruct::~ClearCondVarOnDestruct() {}
