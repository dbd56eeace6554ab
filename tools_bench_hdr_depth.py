"""A/B the HDR export pipeline depth on the real chip (VERDICT r4 #8).

Interleaved round-robin over depths so tunnel drift hits all variants
equally (same methodology as tools_bench_mainpass_ab.py). Each sample is
a full 5-export run (render+color-match+despeckle on device, PNG encode
on host) at the bench's 1920x1440 crop from a 4K P010 source.

    python tools_bench_hdr_depth.py [rounds]
"""

import sys

import bench as B


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    # depth = renders in flight DURING an encode (saver hdr_depth
    # semantics); 0 = fully serial baseline
    depths = (0, 1, 2, 3)
    B._wait_for_device()
    results = {d: [] for d in depths}
    # warm all compiles once (same params for every depth)
    B._bench_hdr_exports(n_runs=1, depth=1, mfu=False)
    for r in range(rounds):
        for d in depths:
            rate, _, _ = B._bench_hdr_exports(n_runs=1, depth=d, mfu=False)
            results[d].append(rate)
            print(f"round {r} depth {d}: {rate}/s", flush=True)
    print("\nmedians:")
    for d in depths:
        rs = sorted(results[d])
        print(f"  depth {d}: {rs[len(rs) // 2]}/s  (runs {rs})")


if __name__ == "__main__":
    main()
