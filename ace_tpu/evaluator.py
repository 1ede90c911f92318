"""``python -m ace_tpu.evaluator`` entry (reference: fme/ace/evaluator.py)."""

from ace_tpu.inference.evaluator import main

if __name__ == "__main__":
    main()
