"""``python -m pix2pose_tpu.eval`` — BOP RGB evaluation CLI."""

from pix2pose_tpu.eval.bop_eval import main

if __name__ == "__main__":
    main()
