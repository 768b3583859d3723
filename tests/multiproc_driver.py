"""Driver for the REAL 2-process ``jax.distributed`` training test.

Launched as a subprocess by ``test_cli.py::test_real_two_process_training
_matches_single_process`` — NOT a test module. Each process owns ONE CPU
device; a 2-process run therefore trains dp=2 over DCN exactly the way a
2-host pod would (reference launches per-GPU processes via
tacotron2_tm/multiproc.py:8-57 + init_process_group, train.py:91-103).

argv: coordinator_addr process_id num_processes filelist run_dir iters
"""
import sys

import jax

jax.config.update("jax_platforms", "cpu")

HPARAMS = (
    "batch_size=2,"
    "sampling_rate=22050,filter_length=512,hop_length=128,win_length=512,"
    "n_mel_channels=20,mel_fmax=8000.0,"
    "symbols_embedding_dim=16,n_speakers=4,speaker_embedding_dim=8,"
    "encoder_speaker_embed_dim=4,encoder_conv_hidden_dim=16,"
    "encoder_lstm_dim=16,encoder_n_convolutions=1,torchmoji_dim=8,"
    "torchmoji_crushed_dim=4,memory_bottleneck_dim=16,prenet_dim=8,"
    "attention_rnn_dim=16,decoder_rnn_dim=16,second_decoder_rnn_dim=0,"
    "attention_dim=8,windowed_attention_range=4,postnet_embedding_dim=16,"
    "postnet_n_convolutions=2,postnet_residual_connections=0,"
    "text_buckets=[32],mel_buckets=[192],max_segment_frames=192,"
    # curation makes DATA-dependent drop/resample decisions; with the
    # tiny model its attention scores sit at the threshold, so dp-vs-
    # single float noise would fork the curated filelists and break the
    # parity comparison (the allgather merge itself still runs)
    "trim_enable=False,curation_enable=False"
)


def main():
    addr, pid, nproc, filelist, run_dir, iters = sys.argv[1:7]
    if int(nproc) > 1:
        from cookietts_tpu.parallel.launch import initialize
        ok = initialize(addr, int(nproc), int(pid))
        assert ok, "distributed initialize refused"
        assert jax.process_count() == int(nproc), jax.process_count()
    from cookietts_tpu import cli
    cli.main(["train", "--model", "tacotron2", "--filelist", filelist,
              "--iters", iters, "--run_dir", run_dir,
              "--hparams", HPARAMS])
    print(f"DRIVER-DONE pid={pid}")


if __name__ == "__main__":
    main()
