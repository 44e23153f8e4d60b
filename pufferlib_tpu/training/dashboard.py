"""Rich terminal dashboard + utilization sampling.

Parity: reference clean_pufferl.py:484-507 (Utilization thread) and
:603-738 (print_dashboard): header with host/device utilization, summary
(env/steps/SPS/epoch/uptime/remaining), per-phase perf, losses, user
stats, message. GPU columns become TPU HBM stats from
device.memory_stats().
"""
import time
from collections import deque
from threading import Thread

import numpy as np

ROUND_OPEN = None
c1 = '[bright_cyan]'
c2 = '[white]'
c3 = '[cyan]'
b1 = '[bright_cyan]'
b2 = '[bright_white]'


def abbreviate(num):
    if num < 1e3:
        return f'{b2}{num:.0f}'
    if num < 1e6:
        return f'{b2}{num/1e3:.1f}{c2}k'
    if num < 1e9:
        return f'{b2}{num/1e6:.1f}{c2}m'
    if num < 1e12:
        return f'{b2}{num/1e9:.1f}{c2}b'
    return f'{b2}{num/1e12:.1f}{c2}t'


def duration(seconds):
    seconds = int(seconds)
    h = seconds // 3600
    m = (seconds % 3600) // 60
    s = seconds % 60
    if h:
        return f'{b2}{h}{c2}h {b2}{m}{c2}m {b2}{s}{c2}s'
    if m:
        return f'{b2}{m}{c2}m {b2}{s}{c2}s'
    return f'{b2}{s}{c2}s'


def fmt_perf(name, t, uptime):
    percent = 0 if uptime == 0 else int(100 * t / uptime - 1e-5)
    return f'{c1}{name}', duration(t), f'{b2}{percent:2d}%'


def device_memory_fraction():
    """Fraction of accelerator HBM in use (0 when unavailable)."""
    try:
        import jax
        stats = jax.local_devices()[0].memory_stats()
        if stats and 'bytes_in_use' in stats and 'bytes_limit' in stats:
            return stats['bytes_in_use'] / max(stats['bytes_limit'], 1)
    except Exception:
        pass
    return 0.0


class Utilization(Thread):
    """Background sampler: host CPU/mem + device HBM (reference
    clean_pufferl.py:484-507)."""

    def __init__(self, delay=1, maxlen=20):
        super().__init__(daemon=True)
        self.cpu_mem = deque(maxlen=maxlen)
        self.cpu_util = deque(maxlen=maxlen)
        self.device_mem = deque(maxlen=maxlen)
        self.delay = delay
        self.stopped = False
        try:
            import psutil
            self._psutil = psutil
        except ImportError:
            self._psutil = None
        self.start()

    def run(self):
        while not self.stopped:
            if self._psutil is not None:
                self.cpu_util.append(self._psutil.cpu_percent())
                mem = self._psutil.virtual_memory()
                self.cpu_mem.append(100 * mem.active / mem.total)
            self.device_mem.append(100 * device_memory_fraction())
            time.sleep(self.delay)

    def stop(self):
        self.stopped = True


def _mean(dq):
    return float(np.mean(dq)) if len(dq) else 0.0


def print_dashboard(env_name, utilization, global_step, epoch, profile,
        losses, stats, msg, clear=False, max_stats=[0]):
    import rich
    from rich.console import Console
    from rich.table import Table

    global ROUND_OPEN
    if ROUND_OPEN is None:
        ROUND_OPEN = rich.box.Box(
            '╭──╮\n│  │\n│  │\n│  │\n│  │\n│  │\n│  │\n╰──╯\n')

    console = Console()
    if clear:
        console.clear()

    dashboard = Table(box=ROUND_OPEN, expand=True, show_header=False,
        border_style='bright_cyan')

    table = Table(box=None, expand=True, show_header=False)
    dashboard.add_row(table)
    table.add_column(justify='left', width=30)
    table.add_column(justify='center', width=12)
    table.add_column(justify='center', width=12)
    table.add_column(justify='right', width=13)
    table.add_row(
        f':blowfish: {c1}PufferLib-TPU {b2}0.1',
        f'{c1}CPU: {c3}{_mean(utilization.cpu_util):.1f}%',
        f'{c1}DRAM: {c3}{_mean(utilization.cpu_mem):.1f}%',
        f'{c1}HBM: {c3}{_mean(utilization.device_mem):.1f}%',
    )

    s = Table(box=None, expand=True)
    s.add_column(f'{c1}Summary', justify='left', vertical='top', width=16)
    s.add_column(f'{c1}Value', justify='right', vertical='top', width=8)
    s.add_row(f'{c2}Environment', f'{b2}{env_name}')
    s.add_row(f'{c2}Agent Steps', abbreviate(global_step))
    s.add_row(f'{c2}SPS', abbreviate(profile.SPS))
    s.add_row(f'{c2}Epoch', abbreviate(epoch))
    s.add_row(f'{c2}Uptime', duration(profile.uptime))
    s.add_row(f'{c2}Remaining', duration(profile.remaining))

    p = Table(box=None, expand=True, show_header=False)
    p.add_column(f'{c1}Performance', justify='left', width=10)
    p.add_column(f'{c1}Time', justify='right', width=8)
    p.add_column(f'{c1}%', justify='right', width=4)
    p.add_row(*fmt_perf('Evaluate', profile.eval_time, profile.uptime))
    p.add_row(*fmt_perf('  Forward', profile.eval_forward_time,
        profile.uptime))
    p.add_row(*fmt_perf('  Env', profile.env_time, profile.uptime))
    p.add_row(*fmt_perf('  Misc', profile.eval_misc_time, profile.uptime))
    p.add_row(*fmt_perf('Train', profile.train_time, profile.uptime))
    p.add_row(*fmt_perf('  Forward', profile.train_forward_time,
        profile.uptime))
    p.add_row(*fmt_perf('  Learn', profile.learn_time, profile.uptime))
    p.add_row(*fmt_perf('  Misc', profile.train_misc_time, profile.uptime))

    l = Table(box=None, expand=True)
    l.add_column(f'{c1}Losses', justify='left', width=16)
    l.add_column(f'{c1}Value', justify='right', width=8)
    for metric, value in losses.items():
        l.add_row(f'{c2}{metric}', f'{b2}{value:.3f}')

    monitor = Table(box=None, expand=True, pad_edge=False)
    monitor.add_row(s, p, l)
    dashboard.add_row(monitor)

    table = Table(box=None, expand=True, pad_edge=False)
    dashboard.add_row(table)
    left = Table(box=None, expand=True)
    right = Table(box=None, expand=True)
    table.add_row(left, right)
    left.add_column(f'{c1}User Stats', justify='left', width=20)
    left.add_column(f'{c1}Value', justify='right', width=10)
    right.add_column(f'{c1}User Stats', justify='left', width=20)
    right.add_column(f'{c1}Value', justify='right', width=10)
    i = 0
    for metric, value in stats.items():
        try:
            float(value)
        except (TypeError, ValueError):
            continue
        u = left if i % 2 == 0 else right
        u.add_row(f'{c2}{metric}', f'{b2}{value:.3f}')
        i += 1
    for j in range(max_stats[0] - i):
        u = left if j % 2 == 0 else right
        u.add_row('', '')
    max_stats[0] = max(max_stats[0], i)

    table = Table(box=None, expand=True, pad_edge=False)
    dashboard.add_row(table)
    table.add_row(f' {c1}Message: {c2}{msg}')

    with console.capture() as capture:
        console.print(dashboard)
    print('\033[0;0H' + capture.get())


def make_dashboard_hook(clear_first=True):
    """Returns a data->None hook pluggable into training.ppo data.dashboard."""
    state = {'first': clear_first}

    def hook(data):
        print_dashboard(data.config.env, data.utilization,
            data.global_step, data.epoch, data.profile, data.losses,
            data.stats, data.msg, clear=state.pop('first', False))

    return hook
