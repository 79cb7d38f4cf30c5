"""TensorBoard export for training records.

The reference attaches a `TensorBoard(log_dir='logs')` callback to every
fit (models/CvT(Par).py:471-476).  Here training writes records
xlsx/rows (the artifact of record); this tool mirrors them into
TensorBoard event files so the same dashboards work — decoupled from the
train loop, so the TPU hot path never touches TF.

Usage:
    from transformer_stm_tpu.tools.tb_export import export_records
    export_records("Result/Records/.../cvt_records_50HZ_Bm_....xlsx",
                   "logs/50HZ_Bm")
or CLI: python -m transformer_stm_tpu.tools.tb_export <records.xlsx> <logdir>
"""

from __future__ import annotations

import os
from typing import Optional, Sequence


def export_rows(rows: Sequence[Sequence], logdir: str,
                columns: Optional[Sequence[str]] = None) -> str:
    """rows: [epoch, loss, mae, val_loss, val_mae, lr]-style records
    (column names taken from `columns`, default the CvT records schema).
    Writes one scalar series per column into TB event files."""
    import tensorflow as tf

    columns = list(columns or
                   ["epoch", "loss", "mae", "val_loss", "val_mae", "lr"])
    os.makedirs(logdir, exist_ok=True)
    writer = tf.summary.create_file_writer(logdir)
    with writer.as_default():
        for row in rows:
            step = int(row[0])
            for name, val in zip(columns[1:], row[1:]):
                if val is None:
                    continue
                tf.summary.scalar(name, float(val), step=step)
    writer.close()
    return logdir


def export_records(records_path: str, logdir: str) -> str:
    """Records xlsx (reference schema) -> TensorBoard event files."""
    from ..data.xlsx import read_table

    cols, rows = read_table(records_path)
    return export_rows(rows, logdir, columns=cols)


if __name__ == "__main__":
    import sys

    print(export_records(sys.argv[1], sys.argv[2]))
