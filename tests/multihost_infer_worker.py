"""Worker for test_multihost's INFERENCE twin: one simulated host in a
2-process CPU job running the REAL inference CLI over its file shard.

Spawned with argv: <coordinator> <num_processes> <process_id> <out_dir>
[fast5_dir]. Runs cli.reviser.main() in passthrough mode with
--merged_output; rank 0 emits the byte-deterministic merged fasta.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    coordinator, nproc, pid, out_dir = (
        sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4])
    fast5_dir = (sys.argv[5] if len(sys.argv) > 5
                 else "/root/reference/unitest/test_data/fast5")

    from nanoreviser_tpu.cli.reviser import main as cli_main

    rc = cli_main([
        "-d", fast5_dir,
        "-o", out_dir,
        "-F", "fasta",
        "--revise_mode", "passthrough",
        "--merged_output", os.path.join(out_dir, "merged.fasta"),
        "-e", os.path.join(out_dir, f"failed.rank{pid}.txt"),
        "--coordinator_address", coordinator,
        "--num_processes", nproc,
        "--process_id", pid,
    ])
    print(f"WORKER-DONE {pid} rc={rc}", flush=True)
    sys.exit(rc or 0)


if __name__ == "__main__":
    main()
