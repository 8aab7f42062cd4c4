/* Loopback MPI implementation — see mpi.h for scope and semantics.
 * One process, N std::threads; buffered point-to-point queues keyed
 * (comm, src, dst, tag); Bcast/Reduce/Barrier via sequence-numbered
 * slots (every rank issues collectives on a communicator in the same
 * program order, so a per-thread per-comm counter names each op). */
#include "mpi.h"

#include <condition_variable>
#include <cstring>
#include <deque>
#include <map>
#include <mutex>
#include <utility>
#include <vector>

namespace {

std::mutex g_mu;
std::condition_variable g_cv;

int g_world = 1;
thread_local int tl_rank = 0;
/* per-thread, per-comm collective sequence counters */
thread_local std::map<int, long> tl_bcast_seq;
thread_local std::map<int, long> tl_reduce_seq;
thread_local std::map<int, long> tl_barrier_seq;

/* comm/group registry: id -> world-rank membership (content-addressed;
 * id 0 = MPI_COMM_WORLD, created by mpiloop_init) */
std::vector<std::vector<int>> g_members;

/* point-to-point: (comm, src, dst, tag) -> FIFO of byte buffers */
using PKey = std::tuple<int, int, int, int>;
std::map<PKey, std::deque<std::vector<char>>> g_queues;

/* collectives: (comm, seq) -> slot */
struct BcastSlot {
    std::vector<char> data;
    int readers_left;
};
std::map<std::pair<int, long>, BcastSlot> g_bcast;

struct ReduceSlot {
    /* per-local-rank contributions, summed by the root in rank order so
     * the FP addition order is schedule-independent (bit-deterministic) */
    std::vector<std::vector<long double>> parts;
    int contributed = 0;
};
std::map<std::pair<int, long>, ReduceSlot> g_reduce;

struct BarrierSlot {
    int arrived = 0;
};
std::map<std::pair<int, long>, BarrierSlot> g_barrier;

size_t dt_size(MPI_Datatype dt) {
    switch (dt) {
    case MPI_INT:
        return sizeof(int);
    case MPI_DOUBLE:
        return sizeof(double);
    default:
        return sizeof(long double);
    }
}

int world_of(MPI_Comm comm, int local) {
    const std::vector<int> &m = g_members[comm];
    return (local >= 0 && local < (int)m.size()) ? m[local] : -1;
}

int local_of(MPI_Comm comm, int world) {
    const std::vector<int> &m = g_members[comm];
    for (int i = 0; i < (int)m.size(); i++)
        if (m[i] == world) return i;
    return -1;
}

int register_members(const std::vector<int> &ranks) {
    /* content-addressed: identical membership -> identical handle */
    for (int i = 0; i < (int)g_members.size(); i++)
        if (g_members[i] == ranks) return i;
    g_members.push_back(ranks);
    return (int)g_members.size() - 1;
}

} // namespace

void mpiloop_init(int world_size) {
    std::lock_guard<std::mutex> lk(g_mu);
    g_world = world_size;
    g_members.clear();
    std::vector<int> all(world_size);
    for (int i = 0; i < world_size; i++) all[i] = i;
    g_members.push_back(all); /* id 0 = MPI_COMM_WORLD */
    g_queues.clear();
    g_bcast.clear();
    g_reduce.clear();
    g_barrier.clear();
}

void mpiloop_bind_thread(int world_rank) {
    tl_rank = world_rank;
    tl_bcast_seq.clear();
    tl_reduce_seq.clear();
    tl_barrier_seq.clear();
}

void mpiloop_reset(void) { mpiloop_init(g_world); }

int MPI_Init(int *, char ***) { return MPI_SUCCESS; }
int MPI_Finalize(void) { return MPI_SUCCESS; }

int MPI_Comm_size(MPI_Comm comm, int *size) {
    std::lock_guard<std::mutex> lk(g_mu);
    *size = (int)g_members[comm].size();
    return MPI_SUCCESS;
}

int MPI_Comm_rank(MPI_Comm comm, int *rank) {
    std::lock_guard<std::mutex> lk(g_mu);
    *rank = local_of(comm, tl_rank);
    return MPI_SUCCESS;
}

int MPI_Get_processor_name(char *name, int *len) {
    std::strcpy(name, "loopback");
    *len = 8;
    return MPI_SUCCESS;
}

int MPI_Send(const void *buf, int count, MPI_Datatype dt, int dest, int tag,
             MPI_Comm comm) {
    size_t nbytes = (size_t)count * dt_size(dt);
    std::lock_guard<std::mutex> lk(g_mu);
    int dst_w = world_of(comm, dest);
    PKey key{comm, tl_rank, dst_w, tag};
    g_queues[key].emplace_back((const char *)buf, (const char *)buf + nbytes);
    g_cv.notify_all();
    return MPI_SUCCESS;
}

int MPI_Recv(void *buf, int count, MPI_Datatype dt, int source, int tag,
             MPI_Comm comm, MPI_Status *status) {
    size_t nbytes = (size_t)count * dt_size(dt);
    std::unique_lock<std::mutex> lk(g_mu);
    int src_w = world_of(comm, source);
    PKey key{comm, src_w, tl_rank, tag};
    g_cv.wait(lk, [&] {
        auto it = g_queues.find(key);
        return it != g_queues.end() && !it->second.empty();
    });
    std::vector<char> msg = std::move(g_queues[key].front());
    g_queues[key].pop_front();
    std::memcpy(buf, msg.data(), nbytes < msg.size() ? nbytes : msg.size());
    if (status && status != MPI_STATUS_IGNORE) {
        status->MPI_SOURCE = source;
        status->MPI_TAG = tag;
        status->MPI_ERROR = MPI_SUCCESS;
    }
    return MPI_SUCCESS;
}

int MPI_Bcast(void *buf, int count, MPI_Datatype dt, int root, MPI_Comm comm) {
    size_t nbytes = (size_t)count * dt_size(dt);
    std::unique_lock<std::mutex> lk(g_mu);
    long seq = tl_bcast_seq[comm]++;
    std::pair<int, long> key{comm, seq};
    int nmembers = (int)g_members[comm].size();
    if (nmembers <= 1) return MPI_SUCCESS;
    if (local_of(comm, tl_rank) == root) {
        BcastSlot &slot = g_bcast[key];
        slot.data.assign((const char *)buf, (const char *)buf + nbytes);
        slot.readers_left = nmembers - 1;
        g_cv.notify_all();
    } else {
        g_cv.wait(lk, [&] { return g_bcast.count(key) > 0; });
        BcastSlot &slot = g_bcast[key];
        std::memcpy(buf, slot.data.data(),
                    nbytes < slot.data.size() ? nbytes : slot.data.size());
        if (--slot.readers_left == 0) g_bcast.erase(key);
    }
    return MPI_SUCCESS;
}

int MPI_Reduce(const void *sendbuf, void *recvbuf, int count, MPI_Datatype dt,
               MPI_Op, int root, MPI_Comm comm) {
    /* only MPI_SUM occurs in the reference (main_mpi.c:467-481, 588-602) */
    std::unique_lock<std::mutex> lk(g_mu);
    long seq = tl_reduce_seq[comm]++;
    std::pair<int, long> key{comm, seq};
    int nmembers = (int)g_members[comm].size();
    int me = local_of(comm, tl_rank);
    ReduceSlot &slot = g_reduce[key];
    if (slot.parts.empty()) slot.parts.resize(nmembers);
    std::vector<long double> &mine = slot.parts[me];
    mine.resize(count);
    for (int i = 0; i < count; i++)
        mine[i] = dt == MPI_INT      ? (long double)((const int *)sendbuf)[i]
                  : dt == MPI_DOUBLE ? (long double)((const double *)sendbuf)[i]
                                     : ((const long double *)sendbuf)[i];
    slot.contributed++;
    g_cv.notify_all();
    if (me == root) {
        g_cv.wait(lk, [&] { return g_reduce[key].contributed == nmembers; });
        ReduceSlot &done = g_reduce[key];
        for (int i = 0; i < count; i++) {
            long double acc = 0.0L;
            for (int r = 0; r < nmembers; r++) acc += done.parts[r][i];
            if (dt == MPI_INT)
                ((int *)recvbuf)[i] = (int)acc;
            else if (dt == MPI_DOUBLE)
                ((double *)recvbuf)[i] = (double)acc;
            else
                ((long double *)recvbuf)[i] = acc;
        }
        g_reduce.erase(key);
    }
    return MPI_SUCCESS;
}

int MPI_Barrier(MPI_Comm comm) {
    std::unique_lock<std::mutex> lk(g_mu);
    long seq = tl_barrier_seq[comm]++;
    std::pair<int, long> key{comm, seq};
    int nmembers = (int)g_members[comm].size();
    BarrierSlot &slot = g_barrier[key];
    slot.arrived++;
    if (slot.arrived == nmembers) g_cv.notify_all();
    /* slots are never erased (eager cleanup would race late waiters
     * re-evaluating the predicate) — they persist until the next
     * mpiloop_init; one int per barrier call, a few dozen per capture */
    g_cv.wait(lk, [&] { return g_barrier[key].arrived == nmembers; });
    return MPI_SUCCESS;
}

int MPI_Comm_group(MPI_Comm comm, MPI_Group *group) {
    std::lock_guard<std::mutex> lk(g_mu);
    *group = comm; /* same registry: a group handle is its member list */
    return MPI_SUCCESS;
}

int MPI_Group_incl(MPI_Group group, int n, const int *ranks,
                   MPI_Group *newgroup) {
    std::lock_guard<std::mutex> lk(g_mu);
    std::vector<int> members(n);
    for (int i = 0; i < n; i++) members[i] = g_members[group][ranks[i]];
    *newgroup = register_members(members);
    return MPI_SUCCESS;
}

int MPI_Comm_create(MPI_Comm, MPI_Group group, MPI_Comm *newcomm) {
    std::lock_guard<std::mutex> lk(g_mu);
    /* content-addressed: all callers get the handle; only members use it
     * (true of every call site in main_mpi.c) */
    *newcomm = group;
    return MPI_SUCCESS;
}

int MPI_Group_free(MPI_Group *group) {
    *group = -1;
    return MPI_SUCCESS;
}

int MPI_Comm_free(MPI_Comm *comm) {
    *comm = MPI_COMM_NULL;
    return MPI_SUCCESS;
}
