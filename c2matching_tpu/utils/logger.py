"""Logging: root logger, per-iteration message formatter, tensorboard.

Parity target: mmsr/utils/logger.py (get_root_logger :84-118, MessageLogger
:31-74, init_tb_logger :77-81). Log-format parity is kept ([name..][epoch,
iter, lr] [eta, time, data_time] losses) so downstream log parsers work.
Rank gating uses ``jax.process_index()`` instead of torch.distributed rank.
"""
import datetime
import logging
import time

_initialized_loggers = set()


def _process_index():
    try:
        import jax
        return jax.process_index()
    except Exception:
        return 0


def get_root_logger(logger_name='base', log_level=logging.INFO,
                    log_file=None):
    """Create/fetch the framework root logger.

    Non-zero processes are silenced to ERROR, matching the reference's
    rank-gated logging (logger.py:109-113).
    """
    logger = logging.getLogger(logger_name)
    if logger_name in _initialized_loggers:
        return logger
    format_str = '%(asctime)s.%(msecs)03d - %(levelname)s: %(message)s'
    stream_handler = logging.StreamHandler()
    stream_handler.setFormatter(logging.Formatter(format_str))
    logger.addHandler(stream_handler)
    logger.propagate = False
    if _process_index() != 0:
        logger.setLevel(logging.ERROR)
    else:
        logger.setLevel(log_level)
        if log_file is not None:
            file_handler = logging.FileHandler(log_file, 'w')
            file_handler.setFormatter(logging.Formatter(format_str))
            file_handler.setLevel(log_level)
            logger.addHandler(file_handler)
    _initialized_loggers.add(logger_name)
    return logger


def init_tb_logger(log_dir):
    from tensorboardX import SummaryWriter
    return SummaryWriter(log_dir=log_dir)


class MessageLogger:
    """Per-iteration training log formatter with ETA.

    Format: ``[name..][epoch:E, iter:I, lr:(...)] [eta: .., time: .., ``
    ``data_time: ..] loss_a: v loss_b: v`` — the reference's layout
    (logger.py:40-74).
    """

    def __init__(self, opt, start_iter=1, tb_logger=None):
        self.exp_name = opt['name']
        self.interval = opt['logger']['print_freq']
        self.start_iter = start_iter
        self.max_iters = opt['train']['niter']
        self.use_tb_logger = opt['logger'].get('use_tb_logger', True)
        self.tb_logger = tb_logger
        self.start_time = time.time()
        self.logger = get_root_logger()

    def __call__(self, log_vars):
        epoch = log_vars.pop('epoch')
        current_iter = log_vars.pop('iter')
        lrs = log_vars.pop('lrs')

        message = (f'[{self.exp_name[:5]}..][epoch:{epoch:3d}, '
                   f'iter:{current_iter:8,d}, lr:(')
        message += ', '.join(f'{v:.3e}' for v in lrs) + ')] '

        if 'time' in log_vars:
            iter_time = log_vars.pop('time')
            data_time = log_vars.pop('data_time')
            total_time = time.time() - self.start_time
            time_sec_avg = total_time / (current_iter - self.start_iter + 1)
            eta_sec = time_sec_avg * (self.max_iters - current_iter - 1)
            eta_str = str(datetime.timedelta(seconds=int(eta_sec)))
            message += (f'[eta: {eta_str}, time: {iter_time:.3f}, '
                        f'data_time: {data_time:.3f}] ')

        for k, v in log_vars.items():
            # device arrays are fetched here (print time), not per-iter —
            # on the tunneled platform each fetch is a host roundtrip
            v = float(v)
            message += f'{k}: {v:.4e} '
            if self.tb_logger and self.use_tb_logger:
                self.tb_logger.add_scalar(k, v, current_iter)
            if k.startswith('offset_absmean') and v > 100:
                # exploding-offset detection, reference format
                # (DCNv2/dcn_v2.py:247-250)
                self.logger.warning(
                    f'Offset mean is {v}, larger than 100.')
        self.logger.info(message)
