"""``python -m template_speech_recognition_tpu`` dispatches the CLI."""

import sys

from template_speech_recognition_tpu.cli import main

if __name__ == "__main__":
    sys.exit(main())
