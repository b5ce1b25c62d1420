"""CLI driver — parity with the reference's four click subcommands
(reference: __main__.py:10-77: group with -c/--config, -l/--logfile,
-V; ``apache-access``/``authfail``/``maillog`` read log lines and
append to tables; ``dailyreport`` assembles the report and emits it
via pager on a TTY, as a serialized EmailMessage otherwise).

Spark-native differences, same surface:

- The reference processes stdin line-by-line inside one DB
  transaction. Here each ingest subcommand spools stdin to a temp
  file (or takes ``-i/--input`` pointing at an existing file/dir) and
  runs the availableNow Structured-Streaming pipeline over it —
  checkpointed, dead-lettered, partitioned appends into
  ``[storage].tables_dir``.
- ``--lenient`` downgrades the reference's halt-on-first-error exit(1)
  (apache_access.py:128-143) to dead-letter routing; strict is the
  default, and the error record printed on halt is the reference's
  JSON shape (time/line/error_type/error).
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from datetime import datetime, timezone
from email.message import EmailMessage
from pathlib import Path

import click

from . import __version__
from .config import Config


@click.group(context_settings={"help_option_names": ["-h", "--help"]})
@click.option(
    "-c",
    "--config",
    "config_file",
    type=click.Path(exists=True, readable=True, dir_okay=False, path_type=Path),
    required=True,
)
@click.option(
    "-l",
    "--logfile",
    type=click.Path(exists=False, writable=True, dir_okay=False, path_type=Path),
)
@click.version_option(__version__, "-V", "--version", message="%(prog)s %(version)s")
@click.pass_context
def main(ctx: click.Context, config_file: Path, logfile: Path | None) -> None:
    ctx.obj = Config.from_toml_file(config_file)
    if logfile is not None:
        sys.stderr = logfile.open("a")


def _spool_stdin(suffix: str) -> str:
    """Write stdin to a temp file so the file-based stream can read it
    (the reference reads stdin directly; Spark sources are files)."""
    d = tempfile.mkdtemp(prefix="logsdb_spark_stdin_")
    target = Path(d) / f"input{suffix}"
    target.write_bytes(sys.stdin.buffer.read())
    return d


def _run_ingest(cfg: Config, ingest_fn, input_path: str | None,
                strict: bool, suffix: str = ".log") -> None:
    from .streaming.ingest import StrictIngestError, run_until_drained

    source = input_path or _spool_stdin(suffix)
    spark = cfg.connect()
    try:
        q = ingest_fn(
            spark, source, cfg.storage.tables_dir, strict=strict
        )
        run_until_drained(q)
    except Exception as e:
        # Reference error-record shape (apache_access.py:128-143). A
        # StrictIngestError raised inside foreachBatch surfaces from
        # awaitTermination as a StreamingQueryException whose message
        # embeds the original — recover the real type by name.
        error_type = type(e).__name__
        if isinstance(e, StrictIngestError) or StrictIngestError.__name__ in str(e):
            error_type = StrictIngestError.__name__
        print(
            json.dumps(
                {
                    "time": time.strftime(
                        "%Y-%m-%dT%H:%M:%SZ", time.gmtime()
                    ),
                    "error_type": error_type,
                    "error": str(e).strip().splitlines()[0] if str(e) else "",
                }
            ),
            file=sys.stderr,
            flush=True,
        )
        sys.exit(1)


_INPUT_OPT = click.option(
    "-i",
    "--input",
    "input_path",
    type=click.Path(exists=True, readable=True, path_type=str),
    help="File or directory of log lines (default: spool stdin).",
)
_STRICT_OPT = click.option(
    "--strict/--lenient",
    default=True,
    help="Halt on the first unparsable line (reference behavior) or "
    "route it to the dead-letter table and continue.",
)


@main.command("apache-access")
@_INPUT_OPT
@_STRICT_OPT
@click.pass_obj
def apache_access_cmd(cfg: Config, input_path: str | None, strict: bool) -> None:
    from .streaming.ingest import ingest_apache_access

    _run_ingest(cfg, ingest_apache_access, input_path, strict)


@main.command("authfail")
@_INPUT_OPT
@_STRICT_OPT
@click.pass_obj
def authfail_cmd(cfg: Config, input_path: str | None, strict: bool) -> None:
    from .streaming.ingest import ingest_authfail

    _run_ingest(cfg, ingest_authfail, input_path, strict)


@main.command("jsonl")
@_INPUT_OPT
@_STRICT_OPT
@click.pass_obj
def jsonl_cmd(cfg: Config, input_path: str | None, strict: bool) -> None:
    """Ingest JSONL event dumps (extension format; one object/line)."""
    from .streaming.ingest import ingest_jsonl

    _run_ingest(cfg, ingest_jsonl, input_path, strict, suffix=".jsonl")


@main.command("maillog")
@_INPUT_OPT
@click.pass_obj
def maillog_cmd(cfg: Config, input_path: str | None) -> None:
    """Ingest one RFC-5322 message per input file (the reference reads
    one message per invocation from stdin — maillog.py:141-163)."""
    from .streaming.ingest import ingest_maillog, run_until_drained

    source = input_path or _spool_stdin(".eml")
    spark = cfg.connect()
    q = ingest_maillog(spark, source, cfg.storage.tables_dir)
    run_until_drained(q)


def render_email(report, recipient: str) -> str:
    """Serialized RFC-5322 message for the non-TTY branch
    (reference __main__.py:69-75)."""
    msg = EmailMessage()
    msg["Subject"] = report.subject
    msg["To"] = recipient
    msg.set_content(report.body)
    return str(msg)


@main.command("dailyreport")
@click.pass_obj
def dailyreport_cmd(cfg: Config) -> None:
    from .report.dailyreport import run_daily_report
    from .report.hostprobe import collect_host_state, local_mail_domains

    spark = cfg.connect()
    host = collect_host_state(cfg)
    now = datetime.now(timezone.utc)
    report = run_daily_report(
        spark, cfg, host, now, local_domains=local_mail_domains()
    )
    if sys.stdout.isatty():
        # Pseudo-e-mail through the pager (reference __main__.py:62-68:
        # quoted-printable serialization garbles non-ASCII in less).
        click.echo_via_pager(
            f"Subject: {report.subject}\n\n{report.body}".rstrip("\n")
        )
    else:
        print(render_email(report, cfg.dailyreport.recipient))


if __name__ == "__main__":
    main()
