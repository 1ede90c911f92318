from ace_tpu.coupled.train import main

if __name__ == "__main__":
    main()
