"""Unitest checker — same contract as the reference's check_nanoreviser.py.

Reference (unitest/check_nanoreviser.py:26-41): every line of the shared
unitest log must be level INFO with a message starting "Congratulations";
print a pass/fail banner.
"""

import os
import sys

LOG = os.path.join(os.path.dirname(__file__), "unitest_log.txt")


def main() -> int:
    if not os.path.exists(LOG):
        print("NanoReviser unitest FAILED: no log file was written")
        return 1
    ok = True
    n = 0
    with open(LOG) as fp:
        for line in fp:
            line = line.strip()
            if not line:
                continue
            n += 1
            parts = line.split(" - ")
            if len(parts) < 4 or parts[2] != "INFO" or not parts[3].startswith(
                "Congratulations"
            ):
                ok = False
                print(f"unexpected log line: {line}")
    if ok and n > 0:
        print("#" * 60)
        print("Congratulations, NanoReviser-TPU passed the unitest!")
        print("#" * 60)
        return 0
    print("NanoReviser unitest FAILED")
    return 1


if __name__ == "__main__":
    sys.exit(main())
