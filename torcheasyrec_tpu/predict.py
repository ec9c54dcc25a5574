"""Predict CLI (reference /root/reference/tzrec/predict.py)."""

import argparse

from torcheasyrec_tpu.main import predict

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--predict_input_path", type=str, required=True)
    parser.add_argument("--predict_output_path", type=str, required=True)
    parser.add_argument("--scripted_model_path", type=str, required=True)
    parser.add_argument("--reserved_columns", type=str, default=None)
    parser.add_argument("--output_columns", type=str, default=None)
    parser.add_argument("--batch_size", type=int, default=None)
    args = parser.parse_args()
    predict(
        args.predict_input_path,
        args.predict_output_path,
        args.scripted_model_path,
        reserved_columns=args.reserved_columns,
        output_columns=args.output_columns,
        batch_size=args.batch_size,
    )
