from vllm_tpu.entrypoints.cli import main

if __name__ == "__main__":
    main()
