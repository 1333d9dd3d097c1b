import sys

from marie_tpu_cli import main

sys.exit(main())
