"""`python -m medaka_tpu` entry point."""
import sys

from medaka_tpu.cli import main

if __name__ == "__main__":
    sys.exit(main())
