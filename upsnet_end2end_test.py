"""Reference-named alias: `python upsnet_end2end_test.py --cfg <yaml>`
(uber-research/UPSNet entry-point name). Forwards to tools/test.py."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tools.test import main  # noqa: E402

if __name__ == "__main__":
    main()
